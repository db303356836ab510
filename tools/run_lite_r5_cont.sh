#!/bin/bash
# Round-5 continuation: extend the lite run 120k -> 240k steps (same recipe,
# same batch/PRNG stream via the global step) to test whether the reference's
# full-reverse SR semantics BEGIN converging with 2x training, and whether
# the SR stage pushes past bicubic parity (BASELINE round-5 table).
# Probe-gated per attempt; crash-resume from the latest checkpoint+sidecar.
cd /root/repo
for attempt in 1 2 3 4 5 6; do
  echo "[run_lite_r5_cont] attempt $attempt $(date -u +%H:%M:%S)" >> examples/lite_r5/train.log
  python tools/tpu_watchdog.py --interval 120 --probe-timeout 90 --max-wait 5400 -- \
    python examples/train_flagship_tpu.py --model lite --holdout 3 \
      --steps 240000 --batch 16 --items 512 --chunk 200 --save_every 10000 \
      --out examples/lite_r5 --resume examples/lite_r5 --resume_tag latest \
      >> examples/lite_r5/train.log 2>&1
  rc=$?
  echo "[run_lite_r5_cont] attempt $attempt exited rc=$rc $(date -u +%H:%M:%S)" >> examples/lite_r5/train.log
  if [ $rc -eq 0 ]; then
    touch examples/lite_r5/CONT_DONE
    exit 0
  fi
  sleep 30
done
exit 1
