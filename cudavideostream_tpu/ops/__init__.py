"""Device operators (JAX/XLA/Pallas) and their golden CPU references."""
