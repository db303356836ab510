#!/bin/bash
# Post-run pipeline for the round-5 lite cascade (examples/lite_r5):
#  1. wait for the trainer relaunch loop's RUN_DONE marker,
#  2. export the committable bf16 EMA checkpoint (tools/export_ckpt.py),
#  3. run the FULL quality eval from the COMMITTED artifact layout
#     (--committed), probe-gated through tools/tpu_watchdog.py,
# so the committed metrics are exactly what a fresh clone reproduces.
# Eval metrics persist incrementally (fullrev/holdout first), so a retry
# after a tunnel wedge re-runs warm-compiled sections quickly.
cd /root/repo
while [ ! -f examples/lite_r5/RUN_DONE ]; do sleep 60; done
echo "[postrun] RUN_DONE seen $(date -u +%H:%M:%S)" >> examples/lite_r5/postrun.log
python tools/export_ckpt.py --src examples/lite_r5 --dst assets/lite_ckpt --tag final \
  >> examples/lite_r5/postrun.log 2>&1 || exit 1
touch examples/lite_r5/EXPORT_DONE
for attempt in 1 2 3; do
  echo "[postrun] eval attempt $attempt $(date -u +%H:%M:%S)" >> examples/lite_r5/postrun.log
  python tools/tpu_watchdog.py --interval 120 --probe-timeout 90 --max-wait 5400 -- \
    python tools/flagship_quality_eval.py --ckpt assets/lite_ckpt --committed \
    >> examples/lite_r5/postrun.log 2>&1
  rc=$?
  echo "[postrun] eval attempt $attempt exited rc=$rc $(date -u +%H:%M:%S)" >> examples/lite_r5/postrun.log
  if [ $rc -eq 0 ]; then
    touch examples/lite_r5/EVAL_DONE
    exit 0
  fi
  sleep 30
done
exit 1
