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
