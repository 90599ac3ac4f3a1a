"""TPU-native multi-camera SLAM engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
AlterPang/Multi_ORB_SLAM (a dual RGB-D camera fork of ORB-SLAM2):

- ORB pyramid feature extraction batched over rig cameras (Pallas kernels)
- Descriptor matching as masked batched Hamming argmin kernels
- Bag-of-words place recognition as vectorized tree descent + inverted index
- The full optimization stack (motion-only BA, local BA with explicit Schur
  complement, Sim3 loop refinement, essential-graph pose optimization, global
  BA) as batched Levenberg-Marquardt solvers with per-observation rig
  extrinsics
- Distributed bundle adjustment over a `jax.sharding.Mesh` (map-point blocks
  sharded over devices, Schur camera system reduced with `psum`)

The reference's pointer-graph + 3-thread design is replaced by fixed-capacity
structure-of-arrays state and a deterministic staged pipeline
(track -> map-update -> loop-check).  See SURVEY.md for the reference
structural analysis this is built against.
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# SLAM geometry is numerically unforgiving: pose chains (Tcw compositions),
# normal-equation assembly, and Schur solves all run through dot_general,
# and the TPU's DEFAULT matmul precision truncates f32 operands to bf16
# MXU passes (~1e-2 relative error).  Measured end-to-end on a v5e: with
# the default precision the TUM driver loses tracking repeatedly and
# emits NaN poses; at float32 it matches the CPU trajectory (2.4 cm vs
# 0.6 cm ATE, vs unusable).  The same failure was first isolated in the
# point_sums Pallas kernel (NOTES_ROUND2 §2) — this makes the fix
# systemic.  Hot kernels that tolerate bf16 (image convolutions,
# descriptor popcount sums — integer ops are unaffected) opt back in
# locally with an explicit precision argument.
#
# NOTE: this mutates PROCESS-GLOBAL JAX config at import, which changes the
# numerics/perf defaults of unrelated JAX code sharing the process.  Set
# MULTI_ORB_SLAM_NO_PRECISION_OVERRIDE=1 to opt out — but then every SLAM
# entry point must run under
# `with jax.default_matmul_precision("float32"): ...` or the geometry NaNs
# on TPU (see above).
if not _os.environ.get("MULTI_ORB_SLAM_NO_PRECISION_OVERRIDE"):
    _jax.config.update("jax_default_matmul_precision", "float32")
