"""Pallas TPU kernels for the frontend hot loops.

Hand-written kernels for the ops where fusing beats XLA's automatic
fusion (SURVEY section 2 'HOT -> Pallas' rows): the FAST+NMS image pass
(one VMEM-resident sweep instead of ~40 materialized (16, H, W)
intermediates) and the Hamming matcher (unpack + MXU GEMM + top-2 +
mutual-check without materializing distance matrices to HBM).  Each
kernel is gold-tested against its jnp reference implementation in
gslam_tpu.ops (tests/test_pallas.py); interpret mode covers CPU CI.
"""

from gslam_tpu.ops.pallas.fastnms import fast_nms_pallas
from gslam_tpu.ops.pallas.matcher import match_hamming_pallas
from gslam_tpu.ops.pallas.vocab import transform_words_pallas
