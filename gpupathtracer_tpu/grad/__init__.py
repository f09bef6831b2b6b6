"""Differentiable rendering: gradients through the whole estimator.

The reference has no autodiff at all (SURVEY.md §2.4); here the complete
forward path — scene compile (models/scene.py::build_scene), camera ray
generation, hit attribute resolution (ops/intersect.py::resolve_hits), and
shading — is differentiable end to end, in two parts:

- **Interior term** (detached sampling): discrete events (closest-hit
  argmin, hit/miss, sampling decisions) are detached (`stop_gradient`) —
  exact for material/emitter parameters, correct for geometry/camera within
  fixed visibility topology.
- **Boundary term** (grad/edges.py): the silhouette-motion contribution —
  SURVEY.md §7.3's "crux of differentiable" — estimated by explicit edge
  sampling of primary silhouettes, FD-validated (tests/test_edges.py,
  tests/test_grad.py) and composed with the interior term by
  ``edges.value_and_grad_with_edges``.
"""
