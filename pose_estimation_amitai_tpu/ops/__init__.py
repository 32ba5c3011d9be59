"""TPU-native kernel library: pure, jittable ops underpinning the framework.

Every op here replaces a CPU-library kernel in the reference (SURVEY §2.3):
cv2/scipy/PIL affine warps -> :mod:`affine`; Gaussian confmap synthesis ->
:mod:`gaussian`; argmax/soft-argmax decode -> :mod:`peaks`; scipy/skimage
morphology -> :mod:`morphology`; DLT/SVD/triangulation/RQ camera math ->
:mod:`geometry`.
"""

from . import affine, gaussian, geometry, morphology, peaks  # noqa: F401
