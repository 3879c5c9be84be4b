"""Checkpoint interop with the reference's torch format (utils/torch_io.py).

Validated two ways: a flax -> torch -> flax round trip is exact, and the
exported state_dict drives a torch re-implementation of rsl_rl's
ActorCritic Sequential layout to the same outputs as our flax module —
i.e. the key mapping (even-index Linears, transposed weights) is the one
the reference's play.py actually consumes."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from nightmare_rl_tpu.models.actor_critic import ActorCritic  # noqa: E402
from nightmare_rl_tpu.utils import torch_io  # noqa: E402


@pytest.fixture(scope="module")
def net_and_params():
    net = ActorCritic(num_actions=18)
    params = net.init(jax.random.PRNGKey(7), jnp.zeros((1, 66), jnp.float32))
    # randomize so symmetry can't hide mapping bugs
    params = jax.tree_util.tree_map(
        lambda x: x + 0.1 * jax.random.normal(
            jax.random.PRNGKey(int(np.prod(x.shape))), x.shape, x.dtype
        ),
        params,
    )
    return net, params


def test_roundtrip_exact(net_and_params, tmp_path):
    net, params = net_and_params
    path = str(tmp_path / "model_5.pt")
    torch_io.save_pt(path, params, iteration=5)
    back = torch_io.load_pt(path, params)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    blob = torch.load(path, map_location="cpu", weights_only=True)
    assert blob["iter"] == 5
    assert "actor.6.weight" in blob["model_state_dict"]  # 3 hidden + out


def _rsl_rl_actor_critic(sd):
    """rsl_rl v1.0.2's module layout, rebuilt in torch (the library itself
    is not installable here): Sequential(Linear, ELU)x3 + Linear."""
    def mlp(prefix, dims):
        layers = []
        for i in range(len(dims) - 1):
            layers.append(torch.nn.Linear(dims[i], dims[i + 1]))
            if i < len(dims) - 2:
                layers.append(torch.nn.ELU())
        m = torch.nn.Sequential(*layers)
        m.load_state_dict({
            k[len(prefix) + 1:]: v for k, v in sd.items()
            if k.startswith(prefix + ".")
        })
        return m

    return mlp("actor", [66, 54, 42, 30, 18]), mlp("critic", [66, 54, 42, 30, 1])


def test_exported_state_dict_matches_flax_forward(net_and_params, tmp_path):
    net, params = net_and_params
    path = str(tmp_path / "model_0.pt")
    torch_io.save_pt(path, params)
    sd = torch.load(path, map_location="cpu", weights_only=True)[
        "model_state_dict"]
    actor_t, critic_t = _rsl_rl_actor_critic(sd)

    obs = np.random.default_rng(0).normal(size=(4, 66)).astype(np.float32)
    mu_j, std_j, v_j = net.apply(params, jnp.asarray(obs))
    with torch.no_grad():
        mu_t = actor_t(torch.from_numpy(obs)).numpy()
        v_t = critic_t(torch.from_numpy(obs)).numpy()[:, 0]
    np.testing.assert_allclose(np.asarray(mu_j), mu_t, atol=1e-5)
    np.testing.assert_allclose(np.asarray(v_j), v_t, atol=1e-5)
    np.testing.assert_allclose(np.asarray(std_j)[0], sd["std"].numpy(),
                               atol=0)
