"""Multi-chip orchestration: mesh sharding, collective verdict reduction,
and the streaming batch driver.

Proof verification is embarrassingly parallel, so the sharding story is
simple and bandwidth-light: proof batches shard over a 'dp' mesh axis and
FRI query rounds over an optional 'qp' axis; the only collective traffic in
the whole system is the accept/reject reduction (psum over ICI), exactly as
SURVEY.md section 2.8 prescribes.
"""

from .mesh import ShardedVerifier, make_mesh  # noqa: F401
from .stream import BucketedStreamVerifier, StreamVerifier, template_key  # noqa: F401
