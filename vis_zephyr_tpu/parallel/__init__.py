"""Device-mesh + sharding-spec layer.

The reference's distributed substrate is DeepSpeed ZeRO over NCCL
(`script/zero2.json` / `zero3.json`, SURVEY §2.3). TPU-native, the
"communication backend" is sharding specs: a named `jax.sharding.Mesh`
(data / fsdp / model axes) plus PartitionSpec rules per parameter path;
XLA emits the all-gather / reduce-scatter / psum collectives over ICI.
"""

from .mesh import create_mesh, create_multihost_mesh, local_mesh
from .sharding import param_specs, shard_params, batch_spec
