"""TPU Pallas kernels: the hand-scheduled hot ops under the engines.

XLA's variadic sort on TPU is a bitonic network that pays an HBM round
trip roughly per stage group; the Pallas kernels here fuse every stage
whose exchange distance fits in VMEM into single grid passes, which is
where the measured win over `jax.lax.sort` comes from (see
harness/microbench.py and the README op-cost table).
"""

from stringsearch_tpu.ops.bitonic import device_sort, pallas_sort  # noqa: F401
