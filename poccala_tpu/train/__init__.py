"""Training tier: Baum-Welch accumulators, schemes 1/2, SMEM, checkpointing."""
