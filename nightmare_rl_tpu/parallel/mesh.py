"""Device-mesh data parallelism for the PPO trainer.

The TPU-native replacement for the reference's only parallelism (Python
threads over per-env MjData copies, envs/nightmare_v3_env.py:194-210) and for
its absent multi-device story (SURVEY §2.4): envs are sharded over a 1-D
``('data',)`` mesh via shard_map, parameters are replicated, and gradients /
KL / advantage statistics ride ICI through psum/pmean inside the single jitted
iteration.  DCN is only crossed by the host for logging/checkpoints.

Multi-host: call ``jax.distributed.initialize()`` before building the mesh;
``jax.devices()`` then spans the pod slice and the same code scales out.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nightmare_rl_tpu.core.config import PPOCfg
from nightmare_rl_tpu.rl.ppo import PPO, TrainState


def make_mesh(devices: Optional[Sequence] = None, axis: str = "data") -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.array(devices), (axis,))


class ShardedPPO:
    """PPO with envs sharded over a mesh axis; parameters replicated.

    TrainState layout: env_state/obs sharded on the env axis; rng holds one
    key per shard (leading axis = mesh size); everything else replicated.
    """

    def __init__(self, env, cfg: PPOCfg, mesh: Mesh, dtype=jnp.float32):
        self.env = env
        self.cfg = cfg
        self.mesh = mesh
        self.axis = mesh.axis_names[0]
        self.n = mesh.devices.size
        assert env.num_envs % self.n == 0, (
            f"num_envs {env.num_envs} must divide by mesh size {self.n}"
        )
        self.ppo = PPO(env, cfg, dtype=dtype, axis_name=self.axis, num_shards=self.n)

        def iter_body(ts: TrainState):
            # per-shard: unwrap this shard's rng key
            local = ts.replace(rng=ts.rng[0])
            new_ts, stats = self.ppo._iteration(local)
            return new_ts.replace(rng=new_ts.rng[None]), stats

        self._specs_cache = None
        self._step = None
        self._iter_body = iter_body

    # -- sharding specs ---------------------------------------------------

    def _specs(self, ts: TrainState) -> Tuple[Any, Any]:
        rep = lambda tree: jax.tree_util.tree_map(lambda _: P(), tree)
        shd = lambda tree: jax.tree_util.tree_map(lambda _: P(self.axis), tree)
        in_specs = TrainState(
            params=rep(ts.params),
            opt_state=rep(ts.opt_state),
            lr=P(),
            rng=P(self.axis),
            env_state=shd(ts.env_state),
            obs=P(self.axis),
            iteration=P(),
        )
        return in_specs

    def _build(self, ts: TrainState):
        in_specs = self._specs(ts)

        # probe the stats structure with an unsharded twin (collective-free)
        probe = PPO(self.env, self.cfg, dtype=self.ppo.dtype)
        out_shape = jax.eval_shape(
            probe._iteration, ts.replace(rng=ts.rng[0])
        )
        stats_spec = jax.tree_util.tree_map(lambda _: P(), out_shape[1])
        out_specs = (in_specs, stats_spec)
        fn = shard_map(
            self._iter_body,
            mesh=self.mesh,
            in_specs=(in_specs,),
            out_specs=out_specs,
            check_rep=False,
        )
        self._step = jax.jit(fn)
        self._in_specs = in_specs

    # -- public API -------------------------------------------------------

    def init(self, seed: Optional[int] = None) -> TrainState:
        ts = self.ppo.init(self.cfg.seed if seed is None else seed)
        # one rng key per shard
        keys = jax.random.split(ts.rng, self.n)
        ts = ts.replace(rng=keys)
        if self._step is None:
            self._build(ts)
        # place according to specs
        shardings = jax.tree_util.tree_map(
            lambda spec: NamedSharding(self.mesh, spec), self._in_specs,
            is_leaf=lambda x: isinstance(x, P),
        )
        return jax.device_put(ts, shardings)

    def randomize_episode_lengths(self, ts: TrainState) -> TrainState:
        lens = jax.random.randint(
            jax.random.PRNGKey(123), (self.env.num_envs,), 0,
            self.env.max_episode_length, jnp.int32,
        )
        lens = jax.device_put(
            lens, NamedSharding(self.mesh, P(self.axis))
        )
        return ts.replace(env_state=ts.env_state.replace(episode_length=lens))

    def learn_step(self, ts: TrainState):
        return self._step(ts)
