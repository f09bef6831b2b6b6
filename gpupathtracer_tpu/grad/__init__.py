"""Differentiable rendering: gradients through the whole estimator.

The reference has no autodiff at all (SURVEY.md §2.4); here the complete
forward path — scene compile (models/scene.py::build_scene), camera ray
generation, hit attribute resolution (ops/intersect.py::resolve_hits), and
shading — is differentiable end to end. Discrete events (closest-hit argmin,
hit/miss, sampling decisions) are detached (`stop_gradient`), giving the
standard detached-sampling estimator: exact for material/emitter parameters,
correct for geometry/camera within fixed visibility topology (silhouette
terms are not estimated — see grad/inverse.py docstring and PARITY.md).
"""
