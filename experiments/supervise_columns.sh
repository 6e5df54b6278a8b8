#!/bin/bash
# Wedge-tolerant supervisor for Table-I column regeneration on the
# tunneled axon TPU (PARITY.md backend notes).  Each method runs under a
# timeout sized for the WHOLE pipeline -- f32 stepped stage + rescue +
# threaded f64 polish + estimate; the stepped checkpoint
# (results/.ckpt_<method>.npz, fingerprinted) only covers the f32 stage,
# so a timeout that fires mid-polish forfeits the polish work (r4
# postmortem; do not lower below ~7200s for the harmonic d=8 columns).
#
#   bash experiments/supervise_columns.sh harmonic_ekfs harmonic_ckfs
#   bash experiments/supervise_columns.sh cd_ekfs cd_ghfs
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD:/root/.axon_site
mkdir -p logs
LOG=logs/supervise_columns.log
for m in "$@"; do
  for attempt in 1 2; do
    echo "=== $m attempt $attempt $(date -u +%H:%M:%S) ===" >> "$LOG"
    timeout "${COLUMN_TIMEOUT:-7200}" python experiments/run_rmse_table.py \
      --methods "$m" --data-dir results/data --out results >> "$LOG" 2>&1
    rc=$?
    echo "=== $m attempt $attempt rc=$rc $(date -u +%H:%M:%S) ===" >> "$LOG"
    if [ $rc -eq 0 ]; then break; fi
    sleep 90   # let the tunneled worker recover after a kill
  done
done
echo "ALL DONE $(date -u +%H:%M:%S)" >> "$LOG"
