"""Compute ops: geometry, sampling, derivatives, normal equations, pyramid."""
