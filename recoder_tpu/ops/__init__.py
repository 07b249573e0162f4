"""TPU compute ops: fused gather+matmuls, masked losses, ranking metrics."""
