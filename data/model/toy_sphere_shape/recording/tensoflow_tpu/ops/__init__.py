"""Core compute ops: math primitives, BRDF terms, samplers, tensor fields."""
