#!/bin/bash
# One-shot TPU measurement sweep for the round-3 perf campaign.
# Run when the axon tunnel is up:  bash tools/tpu_sweep.sh
# Results accumulate in /tmp/sweep_r3.log; each python run uses the
# persistent compile cache so repeats are cheap.
set -u
LOG=/tmp/sweep_r3.log
cd /root/repo
echo "===== sweep start $(date -u) =====" | tee -a $LOG

probe() {
  timeout 180 python -c "import jax; print(jax.devices())" >/dev/null 2>&1
}
if ! probe; then echo "TPU tunnel down — aborting" | tee -a $LOG; exit 1; fi

run() {  # name, env, script
  echo "--- $1 ---" | tee -a $LOG
  eval "$2 timeout 2400 python -u $3" 2>&1 | grep -v "WARNING\|machine features\|cpu_aot" | tail -5 | tee -a $LOG
}

# 1. train step: defaults (save_qkv=1, remat_min_tokens=4096, gn_sums, defer_up@train)
run train_default "" tools/time_train.py
# 2. train step: save_qkv off (isolates the qkv-save effect)
run train_noqkv "MMDIFF_SAVE_QKV=0" tools/time_train.py
# 3. train step: remat everything (isolates selective-remat effect)
run train_remat_all "MMDIFF_REMAT_MIN_TOKENS=1" tools/time_train.py
# 4. train step: unremat ds>=4 too (only 64^2+32^2 remat)
run train_remat_hi "MMDIFF_REMAT_MIN_TOKENS=16384" tools/time_train.py
# 5. train step at b8 (does the step amortize at larger batch?)
run train_b8 "TB=8" tools/time_train.py
# 5b. raised scoped-VMEM window: one-shot kernels admit bigger shapes
run train_vmem64 "MMDIFF_VMEM_LIMIT_MB=64" tools/time_train.py
run train_vmem32 "MMDIFF_VMEM_LIMIT_MB=32" tools/time_train.py
# 6. SR eval (stock GN at eval + subpixel + defer)
run sr_eval "" tools/time_sr.py
# 7. kernel numerics on real Mosaic (CPU tests run interpret mode)
run kernel_tests_tpu "MMDIFF_TEST_PLATFORM=tpu" "-m pytest tests/test_block_attention.py tests/test_fused_attention.py -q"
echo "===== sweep done $(date -u) =====" | tee -a $LOG
