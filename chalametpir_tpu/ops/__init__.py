"""Device (JAX/XLA/Pallas) compute kernels: exact mod-2^32 linear algebra."""
