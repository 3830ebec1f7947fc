"""PNN / MCP composer tests."""

import numpy as np
import jax
import jax.numpy as jnp

from pulse_tpu.learning.pnn import MCPComposer, PNN, compose_actions, make_pnn_mcp_teacher


class TestPNN:
    def test_shapes(self):
        net = PNN(action_dim=69, num_primitives=3, units=(32, 16))
        params = net.init(jax.random.PRNGKey(0), jnp.zeros((5, 100)))["params"]
        out = net.apply({"params": params}, jnp.zeros((5, 100)))
        assert out.shape == (5, 3, 69)

    def test_lateral_shapes(self):
        net = PNN(action_dim=8, num_primitives=3, units=(16, 16), has_lateral=True)
        params = net.init(jax.random.PRNGKey(0), jnp.zeros((2, 10)))["params"]
        out = net.apply({"params": params}, jnp.ones((2, 10)))
        assert out.shape == (2, 3, 8)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_columns_independent_without_lateral(self):
        """Column c output must not depend on other columns' params."""
        net = PNN(action_dim=4, num_primitives=2, units=(8,))
        x = jnp.ones((1, 6))
        params = net.init(jax.random.PRNGKey(0), x)["params"]
        out0 = net.apply({"params": params}, x)[0, 0]
        # perturb column 1's params; column 0 output unchanged
        params2 = jax.tree.map(lambda p: p, params)
        params2["col1_dense0"]["kernel"] = params2["col1_dense0"]["kernel"] + 1.0
        out0b = net.apply({"params": params2}, x)[0, 0]
        np.testing.assert_allclose(out0, out0b, atol=1e-6)

    def test_compose(self):
        w = jnp.asarray([[0.25, 0.75]])
        prims = jnp.asarray([[[1.0, 0.0], [0.0, 1.0]]])
        np.testing.assert_allclose(compose_actions(w, prims), [[0.25, 0.75]], atol=1e-6)

    def test_teacher_fn(self):
        pnn = PNN(action_dim=6, num_primitives=2, units=(8,))
        comp = MCPComposer(num_primitives=2, units=(8,))
        x = jnp.zeros((3, 12))
        p1 = pnn.init(jax.random.PRNGKey(1), x)["params"]
        p2 = comp.init(jax.random.PRNGKey(2), x)["params"]
        teacher = make_pnn_mcp_teacher(pnn, p1, comp, p2)
        out = teacher(x)
        assert out.shape == (3, 6)
        assert np.all(np.abs(np.asarray(out)) <= 1.0)
