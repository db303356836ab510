#!/bin/bash
# Relaunch loop for the round-5 lite cascade run (examples/lite_r5).
# Each attempt goes through the probe-gated watchdog; on crash the trainer
# resumes itself from the latest checkpoint (+ step sidecar), so a plain
# retry loop converges to --steps.
cd /root/repo
for attempt in 1 2 3 4 5 6; do
  echo "[run_lite_r5] attempt $attempt $(date -u +%H:%M:%S)" >> examples/lite_r5/train.log
  python tools/tpu_watchdog.py --interval 120 --probe-timeout 90 --max-wait 5400 -- \
    python examples/train_flagship_tpu.py --model lite --holdout 3 \
      --steps 120000 --batch 16 --items 512 --chunk 200 --save_every 10000 \
      --out examples/lite_r5 --resume examples/lite_r5 --resume_tag latest \
      >> examples/lite_r5/train.log 2>&1
  rc=$?
  echo "[run_lite_r5] attempt $attempt exited rc=$rc $(date -u +%H:%M:%S)" >> examples/lite_r5/train.log
  if [ $rc -eq 0 ]; then
    touch examples/lite_r5/RUN_DONE
    exit 0
  fi
  sleep 30
done
exit 1
