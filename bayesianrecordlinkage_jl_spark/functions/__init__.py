"""Scalar/column function layer (reference: user comparators + weight_functions.jl)."""
