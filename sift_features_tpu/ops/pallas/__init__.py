"""Hand-written Mosaic TPU kernels for the hot path (used automatically on
TPU when SiftConfig.use_pallas, with XLA fallbacks everywhere else):

  pyramid_kernel      fused Gaussian level + DoG in padded layout
  refine_kernel       per-step Newton solve over DMA'd cube neighborhoods
  orientation_kernel  36-bin gradient histograms over DMA'd windows
  descriptor_kernel   128-bin trilinear descriptor histograms
  util                atan2 / rounding built from Mosaic-lowerable ops

See each module's docstring for the lowering pitfalls these encode
(alignment, roll semantics, scalar placement)."""
