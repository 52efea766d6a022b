"""Model tier: the batched senone bank and HMM topologies."""

from poccala_tpu.models.senone_bank import SenoneBank
from poccala_tpu.models.topology import EmbeddedHMM, build_embedded, build_embedded_batch

__all__ = ["SenoneBank", "EmbeddedHMM", "build_embedded", "build_embedded_batch"]
