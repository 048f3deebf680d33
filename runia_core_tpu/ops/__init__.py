"""TPU-native compute kernels (XLA + Pallas) backing the framework.

These replace the reference's native-code dependencies (faiss, torchvision
ops, entropy_estimators, sklearn BLAS — SURVEY.md section 2.2) with jittable
XLA programs and Pallas kernels.
"""

from runia_core_tpu.ops import knn, linalg

__all__ = ["knn", "linalg"]
