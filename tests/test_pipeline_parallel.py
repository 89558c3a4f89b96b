"""GPipe-style pipeline parallelism building block (beyond reference:
SURVEY §2.4 lists pipeline parallelism as absent upstream)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from liteattention_tpu.parallel.pipeline import pipeline_apply


def _mesh(n):
    if len(jax.devices()) < n:
        pytest.skip(f"needs {n} devices")
    return Mesh(np.array(jax.devices()[:n]), ("pp",))


def _stage(params, x):
    w, b = params
    return jnp.tanh(x @ w + b)


def _sequential(stacked, x):
    w, b = stacked
    for i in range(w.shape[0]):
        x = _stage((w[i], b[i]), x)
    return x


@pytest.mark.parametrize("n,m", [(4, 4), (4, 8), (8, 8)])
def test_pipeline_matches_sequential(n, m):
    mesh = _mesh(n)
    dim, batch = 16, 16
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    w = jax.random.normal(ks[0], (n, dim, dim)) * 0.5
    b = jax.random.normal(ks[1], (n, dim)) * 0.1
    x = jax.random.normal(ks[2], (batch, dim))
    ref = _sequential((w, b), x)
    out = pipeline_apply(_stage, (w, b), x, mesh, "pp",
                         num_microbatches=m)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_pipeline_grads_match_sequential():
    mesh = _mesh(4)
    n, dim, batch = 4, 8, 8
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    w = jax.random.normal(ks[0], (n, dim, dim)) * 0.5
    b = jax.random.normal(ks[1], (n, dim)) * 0.1
    x = jax.random.normal(ks[2], (batch, dim))

    def loss_pp(w, b, x):
        return jnp.sum(
            pipeline_apply(_stage, (w, b), x, mesh, "pp") ** 2
        )

    def loss_seq(w, b, x):
        return jnp.sum(_sequential((w, b), x) ** 2)

    g_pp = jax.grad(loss_pp, argnums=(0, 1, 2))(w, b, x)
    g_seq = jax.grad(loss_seq, argnums=(0, 1, 2))(w, b, x)
    for a, r in zip(g_pp, g_seq):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   atol=1e-5, rtol=1e-5)
