"""Pipeline parallelism (pp) and expert parallelism (ep) — exact-match tests
on the virtual 8-device CPU mesh (SURVEY.md §4 item 5: distributed without a
cluster). Together with dp (data axis), sp/cp (ring attention) and tp
(model-axis param sharding) these complete the parallelism matrix the
reference entirely lacked (SURVEY.md §2 row 19)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avsum_tpu.models.moe import MoEEncoder, MoEFFN
from avsum_tpu.models.temporal import AttentionBlock
from avsum_tpu.parallel import MeshConfig, build_mesh
from avsum_tpu.parallel.pipeline import pipeline_apply, stack_stage_params


@pytest.fixture(scope="module")
def block_setup():
    block = AttentionBlock(dim=32, num_heads=4)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (8, 12, 32))
    mask = jnp.ones((8, 12)).at[:, 10:].set(0.0)
    per_stage = [
        block.init(jax.random.fold_in(rng, i), x[:1], mask[:1])["params"]
        for i in range(4)
    ]
    ref = x
    for p in per_stage:
        ref = block.apply({"params": p}, ref, mask)
    return block, x, mask, per_stage, np.asarray(ref)


def _stage_fn(block):
    def fn(p, xi, mi):
        return block.apply({"params": p}, xi, mi)

    return fn


class TestPipelineParallel:
    def test_exact_vs_sequential(self, block_setup):
        block, x, mask, per_stage, ref = block_setup
        mesh = build_mesh(MeshConfig(data=2, seq=1, model=4, auto_data=False))
        out = pipeline_apply(
            _stage_fn(block), stack_stage_params(per_stage), x, mesh, mask
        )
        np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)

    def test_more_microbatches_than_stages(self, block_setup):
        block, x, mask, per_stage, ref = block_setup
        mesh = build_mesh(MeshConfig(data=2, seq=1, model=4, auto_data=False))
        out = pipeline_apply(
            _stage_fn(block),
            stack_stage_params(per_stage),
            x,
            mesh,
            mask,
            num_microbatches=8,
        )
        np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)

    def test_two_stage_mesh(self, block_setup):
        block, x, mask, per_stage, _ = block_setup
        mesh = build_mesh(MeshConfig(data=4, seq=1, model=2, auto_data=False))
        ref = x
        for p in per_stage[:2]:
            ref = block.apply({"params": p}, ref, mask)
        out = pipeline_apply(
            _stage_fn(block), stack_stage_params(per_stage[:2]), x, mesh, mask
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
        )

    def test_single_stage_degenerates_to_sequential(self, block_setup):
        block, x, mask, per_stage, _ = block_setup
        mesh = build_mesh(MeshConfig(data=8, seq=1, model=1, auto_data=False))
        out = pipeline_apply(
            _stage_fn(block), stack_stage_params(per_stage[:1]), x, mesh, mask
        )
        ref = block.apply({"params": per_stage[0]}, x, mask)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
        )

    @pytest.mark.slow
    def test_differentiable_under_jit(self, block_setup):
        block, x, mask, per_stage, _ = block_setup
        mesh = build_mesh(MeshConfig(data=2, seq=1, model=4, auto_data=False))
        stacked = stack_stage_params(per_stage)
        fn = _stage_fn(block)

        def loss_pp(params, x):
            return pipeline_apply(fn, params, x, mesh, mask).sum()

        def loss_seq(params, x):
            y = x
            for i in range(4):
                y = block.apply(
                    {"params": jax.tree.map(lambda p: p[i], params)}, y, mask
                )
            return y.sum()

        g_pp = jax.jit(jax.grad(loss_pp))(stacked, x)
        g_seq = jax.jit(jax.grad(loss_seq))(stacked, x)
        for a, b in zip(jax.tree.leaves(g_pp), jax.tree.leaves(g_seq)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
            )

    def test_indivisible_batch_raises(self, block_setup):
        block, x, mask, per_stage, _ = block_setup
        mesh = build_mesh(MeshConfig(data=2, seq=1, model=4, auto_data=False))
        with pytest.raises(ValueError, match="not divisible"):
            pipeline_apply(
                _stage_fn(block),
                stack_stage_params(per_stage),
                x[:6],
                mesh,
                mask[:6],
                num_microbatches=4,
            )


class TestExpertParallel:
    @pytest.mark.slow
    def test_moe_encoder_ep_matches_dense(self):
        rng = jax.random.PRNGKey(1)
        x = jax.random.normal(rng, (8, 12, 32))
        mask = jnp.ones((8, 12)).at[:, 9:].set(0.0)
        mesh = build_mesh(MeshConfig(data=4, seq=1, model=2, auto_data=False))
        enc = MoEEncoder(hidden=32, num_layers=2, num_heads=4, n_experts=4, top_k=2)
        enc_ep = MoEEncoder(
            hidden=32, num_layers=2, num_heads=4, n_experts=4, top_k=2, ep_mesh=mesh
        )
        params = enc.init(rng, x, mask)["params"]
        y = enc.apply({"params": params}, x, mask)
        y_ep = enc_ep.apply({"params": params}, x, mask)
        np.testing.assert_allclose(
            np.asarray(y_ep), np.asarray(y), rtol=2e-5, atol=2e-5
        )

    def test_moe_ffn_topk_weights_sum_to_one_effect(self):
        # with top_k == n_experts the gate is a full softmax: output must be
        # a convex combination of expert outputs (bounded by their extremes)
        rng = jax.random.PRNGKey(2)
        x = jax.random.normal(rng, (2, 6, 16))
        ffn = MoEFFN(dim=16, n_experts=3, top_k=3)
        params = ffn.init(rng, x)["params"]
        y = ffn.apply({"params": params}, x)
        assert np.isfinite(np.asarray(y)).all()

    @pytest.mark.slow
    def test_moe_scorer_trains_with_ep(self):
        from avsum_tpu.data.batching import pad_batch
        from avsum_tpu.data.synthetic import make_synthetic_videos
        from avsum_tpu.models import make_model
        from avsum_tpu.train.config import ModelConfig, TrainConfig
        from avsum_tpu.train.steps import (
            create_train_state,
            make_train_step,
            shard_batch_dict,
            shard_state,
            state_shardings,
        )

        mesh = build_mesh(MeshConfig(data=4, seq=1, model=2, auto_data=False))
        cfg = ModelConfig(
            visual_dim=32,
            audio_dim=16,
            hidden_dim=32,
            scorer_hidden=8,
            temporal_encoder="moe",
            moe_experts=4,
            moe_topk=2,
            dropout=0.0,
        )
        model = make_model(cfg, mesh=mesh)
        videos = make_synthetic_videos(
            n_videos=8, min_shots=4, max_shots=8, visual_dim=32, audio_dim=16
        )
        batch = pad_batch(videos, max_shots=8, pad_to_batch=8)
        state = shard_state(
            create_train_state(model, TrainConfig(lr=3e-3), batch, total_steps=20),
            mesh,
        )
        step = make_train_step(
            model, mesh, seed=0, state_sharding=state_shardings(state, mesh)
        )
        losses = []
        for _ in range(20):
            state, metrics = step(state, shard_batch_dict(batch, mesh))
            losses.append(float(jax.device_get(metrics["loss"])))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0], losses
