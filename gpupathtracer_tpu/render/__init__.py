"""Rendering: wavefront integrator, film accumulation, top-level renderer."""
