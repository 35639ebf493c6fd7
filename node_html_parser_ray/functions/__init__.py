"""Scalar/vectorized helper functions shared by stages."""
