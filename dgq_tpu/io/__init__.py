"""Checkpoint IO: bit-compatible readers/writers for DGQ .pth formats and
torch<->JAX parameter conversion."""
