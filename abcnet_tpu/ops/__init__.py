"""Device-side ops: target scattering, NMS, focal losses, Pallas kernels."""
