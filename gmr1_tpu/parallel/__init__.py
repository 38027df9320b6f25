"""Device-mesh scaling: carrier/time sharded pipelines over ICI.

The reference's process-level parallelism (channelizer process + one
demod process per ARFCN) becomes one SPMD program: time-sharded PFB
analysis with ppermute halo exchange, an all_to_all reshard to
carrier-sharded, and carrier-parallel demod/decode (SURVEY.md §5.8).
"""

from .transponder import ShardedTransponder

__all__ = ["ShardedTransponder"]
