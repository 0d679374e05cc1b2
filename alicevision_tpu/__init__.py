"""alicevision_tpu — a TPU-native photogrammetry engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
alicevision/AliceVision (see SURVEY.md): feature extraction, image retrieval +
descriptor matching, incremental structure-from-motion with Schur-complement
Levenberg-Marquardt bundle adjustment, SGM plane-sweep multi-view stereo,
depth fusion, meshing and texturing.

Design principles (TPU-first, not a port):
  * struct-of-arrays pytrees instead of std::map<Id, Object>
    (ref: src/aliceVision/sfmData/SfMData.hpp:27-68)
  * enum + vectorized dispatch instead of virtual class hierarchies
    (ref: src/aliceVision/camera/IntrinsicBase.hpp:27)
  * fixed-budget batched hypothesis scoring instead of early-exit RANSAC
    (ref: src/aliceVision/robustEstimation/ACRansac.hpp:78-146)
  * dense/blocked Schur-complement LM on the MXU instead of Ceres sparse CPU
    (ref: src/aliceVision/sfm/bundle/BundleAdjustmentCeres.cpp:216-231)
"""

__version__ = "0.1.0"
