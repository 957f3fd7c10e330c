"""Math primitives for the renderer (reference: source/MathUtilities.{h,cpp},
source/SimpleMath.* — re-designed as pure jnp functions over stacked arrays).

Conventions
-----------
* Column-vector math: ``clip = P @ V @ M @ [x, y, z, 1]^T``.
* Right-handed world space (glTF): +Y up, camera looks down -Z.
* Reverse-Z, infinite far plane (reference: MathUtilities.cpp:3-38,
  GraphicConstants.h "reverse/infinite Z"): depth 1.0 at the near plane,
  0.0 at infinity.  All depth comparisons in the framework are therefore
  "greater == closer".
"""

from toyrenderer_tpu.mathlib.transforms import (
    perspective_reverse_z_infinite,
    look_at,
    quat_to_mat3,
    quat_mul,
    quat_rotate,
    compose_trs,
    frustum_planes_world,
    transform_points,
    transform_directions,
    normalize,
    adjugate3,
    aabb_transform,
)
from toyrenderer_tpu.mathlib.halton import halton, halton_jitter_sequence
