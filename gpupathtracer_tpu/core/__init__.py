"""Core math: glm-convention 4x4 matrix helpers and vector utilities."""
