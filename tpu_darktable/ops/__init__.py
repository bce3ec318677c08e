"""Pure-function TPU ops: every reference CUDA component as a JAX callable."""
