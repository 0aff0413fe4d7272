#!/bin/sh
# Full-reference-schedule TF-side training anchor (VERDICT r4 item 1):
# 10,080 steps = 160 epochs x 63 steps (experiments.ipynb cell 10) for the
# baseline-no-aug and histogram families, with cross-framework FID
# checkpoints on the shared-init InceptionV3 features.
# Sequential on purpose: this host has ONE CPU core.
set -e
cd "$(dirname "$0")/.."
python scripts/reference_train_tf.py \
  --variant baseline-no-aug --steps 10080 --eval-every 252 \
  --fid-at 252,1008,2520,5040,10080 \
  --out reference_train_tf_full.json > /tmp/tf_full_baseline.log 2>&1
python scripts/reference_train_tf.py \
  --variant histogram --steps 10080 --eval-every 252 \
  --fid-at 252,1008,2520,5040,10080 \
  --out reference_train_tf_full_histogram.json > /tmp/tf_full_histogram.log 2>&1
echo done
