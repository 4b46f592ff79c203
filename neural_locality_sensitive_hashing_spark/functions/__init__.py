"""Scalar kernels: native Catalyst expressions + vectorized pandas UDFs."""
