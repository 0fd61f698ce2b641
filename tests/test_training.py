"""Training-stack tests: Muon optimizer, mesh sharding, pjit train step."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from cm3p_tpu.configs import tiny_cm3p_config
from cm3p_tpu.models import CM3PModule
from cm3p_tpu.parallel.mesh import batch_shardings, make_mesh, param_shardings, partition_spec_for
from cm3p_tpu.train.muon import default_muon_label_fn, muon, zeropower_via_newtonschulz5
from cm3p_tpu.train.train_state import create_train_state, make_train_step, shard_train_step



pytestmark = pytest.mark.slow  # see pytest.ini: excluded from the quick gate
class TestMuon:
    def test_newton_schulz_orthogonalizes(self):
        g = jax.random.normal(jax.random.PRNGKey(0), (64, 32))
        x = zeropower_via_newtonschulz5(g, steps=10).astype(jnp.float32)
        gram = np.asarray(x.T @ x)
        # singular values land in ~U(0.5, 1.5); the gram diagonal dominates
        off = gram - np.diag(np.diag(gram))
        assert np.abs(np.diag(gram) - 1.0).mean() < 0.5
        assert np.abs(off).mean() < 0.12

    def test_label_routing(self):
        params = {
            "tok_embeddings": {"embedding": jnp.zeros((100, 16))},
            "layers_0": {"attn": {"Wqkv": {"kernel": jnp.zeros((16, 48)), "bias": jnp.zeros(48)}}},
            "decoder": {"kernel": jnp.zeros((16, 30000))},
        }
        labels = jax.tree_util.tree_map_with_path(default_muon_label_fn, params)
        assert labels["tok_embeddings"]["embedding"] == "adamw"  # embed
        assert labels["layers_0"]["attn"]["Wqkv"]["kernel"] == "muon"
        assert labels["layers_0"]["attn"]["Wqkv"]["bias"] == "adamw"  # 1-D
        assert labels["decoder"]["kernel"] == "muon"  # first dim < 10000

    def test_muon_reduces_loss_on_quadratic(self):
        """Muon should optimize a simple matrix-factorization objective."""
        key = jax.random.PRNGKey(0)
        target = jax.random.normal(key, (32, 32))
        params = {"w": {"kernel": jnp.zeros((32, 32))}, "b": {"bias": jnp.zeros((32,))}}
        tx = muon(0.05)
        opt_state = tx.init(params)

        def loss_fn(p):
            return jnp.mean((p["w"]["kernel"] + p["b"]["bias"][None, :] - target) ** 2)

        losses = []
        for _ in range(50):
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            losses.append(float(loss))
        # Muon's spectral-norm-constant updates plateau near the optimum on
        # quadratics; halving the loss demonstrates healthy descent.
        assert losses[-1] < losses[0] * 0.55

    def test_update_is_orthogonal_scale(self):
        tx = muon(1.0, adamw_lr_ratio=1.0)
        params = {"layer": {"kernel": jnp.zeros((16, 16))}}
        opt_state = tx.init(params)
        grads = {"layer": {"kernel": jax.random.normal(jax.random.PRNGKey(1), (16, 16))}}
        updates, _ = tx.update(grads, opt_state, params)
        u = np.asarray(updates["layer"]["kernel"], np.float32)
        s = np.linalg.svd(u, compute_uv=False)
        # orthogonalized update has singular values ~1 (x lr)
        assert 0.3 < s.min() and s.max() < 2.0


class TestMesh:
    def test_make_mesh_shapes(self):
        mesh = make_mesh(data=4, model=2)
        assert mesh.shape == {"data": 4, "model": 2}

    def test_make_mesh_auto_data(self):
        mesh = make_mesh(model=2)
        assert mesh.shape["data"] * 2 == len(jax.devices())

    def test_partition_rules(self):
        import jax.tree_util as jtu

        path = (jtu.DictKey("layers_0"), jtu.DictKey("attn"), jtu.DictKey("Wqkv"), jtu.DictKey("kernel"))
        spec = partition_spec_for(path, jnp.zeros((64, 192)))
        assert spec == jax.sharding.PartitionSpec(None, "model")
        path = (jtu.DictKey("layers_0"), jtu.DictKey("attn"), jtu.DictKey("Wo"), jtu.DictKey("kernel"))
        spec = partition_spec_for(path, jnp.zeros((64, 64)))
        assert spec == jax.sharding.PartitionSpec("model", None)
        path = (jtu.DictKey("embeddings_norm"), jtu.DictKey("scale"))
        assert partition_spec_for(path, jnp.zeros((64,))) == jax.sharding.PartitionSpec()


@pytest.fixture(scope="module")
def sharded_setup():
    cfg = tiny_cm3p_config()
    cfg.beatmap_config.audio_token_id = 500
    model = CM3PModule(cfg)
    rng = np.random.default_rng(0)
    batch = {
        "input_ids": jnp.asarray(rng.integers(0, 400, (8, 64)), jnp.int32),
        "attention_mask": jnp.ones((8, 64), jnp.int32),
        "metadata_ids": jnp.asarray(rng.integers(0, 200, (8, 2, 16)), jnp.int32),
        "metadata_attention_mask": jnp.ones((8, 2, 16), jnp.int32),
        "metadata_variation_classes": jnp.asarray(np.tile([[0, 1]], (8, 1)), jnp.int32),
    }
    tx = muon(1e-3)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), batch)

    def fresh_state():
        # deep-copy: the jitted step donates its input state buffers
        return jax.tree.map(jnp.array, state)

    return cfg, model, tx, fresh_state, batch


class TestShardedTrainStep:
    def test_dp_only_step(self, sharded_setup):
        cfg, model, tx, fresh_state, batch = sharded_setup
        state = fresh_state()
        mesh = make_mesh(data=8, model=1)
        train_step = make_train_step(model, tx)
        with mesh:
            jitted, ss, bs = shard_train_step(train_step, mesh, state, batch)
            state_s = jax.device_put(state, ss)
            batch_s = jax.device_put(batch, bs)
            new_state, metrics = jitted(state_s, batch_s, jax.random.PRNGKey(1))
        assert int(new_state.step) == 1
        assert np.isfinite(float(metrics["loss"]))

    def test_dp_tp_step_matches_dp(self, sharded_setup):
        """2-way TP must produce the same loss as pure DP (numerics modulo fp error)."""
        cfg, model, tx, fresh_state, batch = sharded_setup
        state = fresh_state()
        train_step = make_train_step(model, tx)
        losses = {}
        for name, (d, m) in {"dp": (8, 1), "dp_tp": (4, 2)}.items():
            state = fresh_state()
            mesh = make_mesh(data=d, model=m)
            with mesh:
                jitted, ss, bs = shard_train_step(train_step, mesh, state, batch)
                st = jax.device_put(state, ss)
                bt = jax.device_put(batch, bs)
                _, metrics = jitted(st, bt, jax.random.PRNGKey(1))
                losses[name] = float(metrics["loss"])
        assert abs(losses["dp"] - losses["dp_tp"]) < 1e-3, losses

    def test_two_steps_reduce_loss_direction(self, sharded_setup):
        cfg, model, tx, fresh_state, batch = sharded_setup
        state = fresh_state()
        mesh = make_mesh(data=8, model=1)
        train_step = make_train_step(model, tx)
        with mesh:
            jitted, ss, bs = shard_train_step(train_step, mesh, state, batch)
            st = jax.device_put(state, ss)
            bt = jax.device_put(batch, bs)
            st, m1 = jitted(st, bt, jax.random.PRNGKey(1))
            st, m2 = jitted(st, bt, jax.random.PRNGKey(1))
        # same batch twice: loss should not explode
        assert np.isfinite(float(m2["loss"]))
        assert int(st.step) == 2


class TestRematModes:
    @pytest.mark.parametrize("remat", [False, True, "dots"])
    def test_remat_modes_same_loss(self, remat):
        """All remat policies are numerically equivalent — they only trade
        backward recompute against saved activations."""
        cfg = tiny_cm3p_config()
        model = CM3PModule(cfg, remat=remat)
        rng = np.random.default_rng(0)
        batch = {
            "input_ids": jnp.asarray(rng.integers(0, 400, (2, 64)), jnp.int32),
            "attention_mask": jnp.ones((2, 64), jnp.int32),
            "metadata_ids": jnp.asarray(rng.integers(0, 200, (2, 2, 16)), jnp.int32),
            "metadata_attention_mask": jnp.ones((2, 2, 16), jnp.int32),
            "metadata_variation_classes": jnp.asarray(np.tile([[0, 1]], (2, 1)), jnp.int32),
        }
        tx = muon(1e-3)
        state = create_train_state(model, tx, jax.random.PRNGKey(0), batch)
        step = jax.jit(make_train_step(model, tx))
        _, metrics = step(state, batch, jax.random.PRNGKey(1))
        loss = float(metrics["loss"])
        assert np.isfinite(loss)
        if not hasattr(TestRematModes, "_ref_loss"):
            TestRematModes._ref_loss = loss
        assert abs(loss - TestRematModes._ref_loss) < 1e-4
