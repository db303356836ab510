#!/bin/bash
# Post-continuation pipeline: when the 300k run lands (CONT2_DONE), re-export
# the committable bf16 EMA artifact over assets/lite_ckpt (git history keeps
# the 120k version) and re-run the full quality eval from the committed
# layout. Eval graphs are warm from the 120k eval, so this pass is fast.
cd /root/repo
while [ ! -f examples/lite_r5/CONT2_DONE ]; do sleep 60; done
echo "[cont2-postrun] CONT2_DONE seen $(date -u +%H:%M:%S)" >> examples/lite_r5/postrun.log
python tools/export_ckpt.py --src examples/lite_r5 --dst assets/lite_ckpt --tag final \
  >> examples/lite_r5/postrun.log 2>&1 || exit 1
touch examples/lite_r5/CONT2_EXPORT_DONE
for attempt in 1 2 3; do
  echo "[cont2-postrun] eval attempt $attempt $(date -u +%H:%M:%S)" >> examples/lite_r5/postrun.log
  python tools/tpu_watchdog.py --interval 120 --probe-timeout 90 --max-wait 5400 -- \
    python tools/flagship_quality_eval.py --ckpt assets/lite_ckpt --committed \
    >> examples/lite_r5/postrun.log 2>&1
  rc=$?
  echo "[cont2-postrun] eval attempt $attempt exited rc=$rc $(date -u +%H:%M:%S)" >> examples/lite_r5/postrun.log
  if [ $rc -eq 0 ]; then
    touch examples/lite_r5/CONT2_EVAL_DONE
    exit 0
  fi
  sleep 30
done
exit 1
