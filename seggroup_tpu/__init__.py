"""seggroup-tpu: a TPU-native (JAX/XLA/Pallas/pjit) framework for two-stage
weakly-supervised 3D instance & semantic segmentation (capabilities of
antao97/SegGroup, re-designed TPU-first).

Layout:
  ops/       device-side primitive library (segment reductions, grouping engine,
             kNN / ball query, FPS, voxelization, connected components, IoU)
  sparse/    unified gather-GEMM-scatter sparse-conv engine (rulebook + conv)
  models/    SegGroup GNN (stage 1), MinkUNet, KPConv FCNN, PointGroup (stage 2)
  data/      ScanNet readers, weak-label generation, transforms, synthetic scenes
  parallel/  mesh / sharding / train-state utilities (pjit data parallelism)
  eval/      semantic mIoU + ScanNet instance mAP harnesses
  utils/     config, checkpointing (orbax), logging, metrics
  csrc/      host-side native (C++) helpers: grid subsampling, radius search,
             voxel rulebooks, connected components (ctypes, numpy fallback)
"""

__version__ = "0.1.0"
