"""Data generation, target encoding and input pipeline."""
