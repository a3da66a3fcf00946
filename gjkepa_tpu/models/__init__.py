"""Shape models (convex hulls + analytic primitives)."""
