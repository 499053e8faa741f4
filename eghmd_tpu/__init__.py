"""eghmd_tpu — a TPU-native framework for edge-guided near-eye image analysis.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
zhaoyuhsin/Edge-Guided-Near-Eye-Image-Analysis-for-Head-Mounted-Displays
(ISMAR 2021): a two-stage pipeline (frozen BDCN edge extractor + ESF-Net
DenseNet segmentation/ellipse-regression network) for AR/VR eye tracking,
with a full training / evaluation / video-inference stack.

Design stance (see SURVEY.md §7):
  * pure-functional flax models, losses OUTSIDE the model forward
  * one `jax.sharding.Mesh` for data parallelism over ICI/DCN
  * branch-free masked losses instead of per-sample python loops
  * device-resident post-processing (soft-argmax, ellipse algebra,
    batched raster refinement) so inference never round-trips per frame
"""

__version__ = "0.1.0"
