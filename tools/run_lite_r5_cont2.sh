#!/bin/bash
# Round-5 continuation: extend the lite run 240k -> 300k steps (same recipe,
# same batch/PRNG stream via the global step) for a THIRD full-reverse-SR
# data point (120k: 0.637, 240k: 0.613 — is ~4%/doubling the trend?) and to
# extend the SR-vs-bicubic margin (27.96 vs 27.08 dB at 240k).
# Probe-gated per attempt; crash-resume from the latest checkpoint+sidecar.
cd /root/repo
for attempt in 1 2 3 4 5 6; do
  echo "[run_lite_r5_cont2] attempt $attempt $(date -u +%H:%M:%S)" >> examples/lite_r5/train.log
  python tools/tpu_watchdog.py --interval 120 --probe-timeout 90 --max-wait 5400 -- \
    python examples/train_flagship_tpu.py --model lite --holdout 3 \
      --steps 300000 --batch 16 --items 512 --chunk 200 --save_every 10000 \
      --out examples/lite_r5 --resume examples/lite_r5 --resume_tag latest \
      >> examples/lite_r5/train.log 2>&1
  rc=$?
  echo "[run_lite_r5_cont2] attempt $attempt exited rc=$rc $(date -u +%H:%M:%S)" >> examples/lite_r5/train.log
  if [ $rc -eq 0 ]; then
    touch examples/lite_r5/CONT2_DONE
    exit 0
  fi
  sleep 30
done
exit 1
