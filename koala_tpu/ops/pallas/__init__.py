# Pallas TPU kernels (fused GRU scan, fused frame pipeline). Populated as
# kernels graduate from the pure-XLA implementations in koala_tpu.ops.
