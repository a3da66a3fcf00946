"""Shape models (convex hulls + analytic primitives)."""
from .shapes import (BOX, CAPSULE, CYLINDER, SPHERE, ShapeBatch, boxes,
                     capsules, concat_shapes, cylinders, make_shape_pair_support,
                     shape_support_world, spheres)

__all__ = ["BOX", "CAPSULE", "CYLINDER", "SPHERE", "ShapeBatch", "boxes",
           "capsules", "concat_shapes", "cylinders", "make_shape_pair_support",
           "shape_support_world", "spheres"]
