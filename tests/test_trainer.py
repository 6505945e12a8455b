"""End-to-end trainer tests on a tiny model: loss goes down on a fixed
batch, checkpoints save/resume, LoRA-only training leaves base weights
untouched."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fish_speech_tpu.config import dual_ar_tiny
from fish_speech_tpu.models import dual_ar
from fish_speech_tpu.models.lora import LoraConfig
from fish_speech_tpu.train.loss import dual_ar_loss
from fish_speech_tpu.train.step import make_optimizer, make_train_step
from fish_speech_tpu.train.trainer import TrainConfig, Trainer

from tests.test_data import NUM_CODEBOOKS, make_proto_file


def make_cfg(tokenizer):
    return dual_ar_tiny(
        vocab_size=tokenizer.vocab_size,
        semantic_begin_id=tokenizer.semantic_begin_id,
        semantic_end_id=tokenizer.semantic_end_id,
        im_end_id=tokenizer.im_end_id,
        num_codebooks=NUM_CODEBOOKS,
        max_seq_len=128,
    )


def make_batch(cfg, rng=None, b=2, t=32):
    rng = rng or np.random.default_rng(0)
    inputs = np.zeros((b, cfg.num_codebooks + 1, t), dtype=np.int32)
    inputs[:, 0] = rng.integers(4, 200, size=(b, t))
    sem = rng.random((b, t)) < 0.6
    for i in range(b):
        codes = rng.integers(0, cfg.codebook_size, size=(cfg.num_codebooks, t))
        span = cfg.semantic_end_id - cfg.semantic_begin_id + 1
        inputs[i, 0, sem[i]] = cfg.semantic_begin_id + codes[0, sem[i]] % span
        inputs[i, 1:, sem[i]] = codes[:, sem[i]].T
    labels = inputs.copy()
    pad_mask = np.zeros((b, t), dtype=bool)
    pad_mask[:, -4:] = True
    labels[:, :, -4:] = -100
    return {"inputs": inputs, "labels": labels, "pad_mask": pad_mask}


def test_loss_decreases_on_fixed_batch(tokenizer):
    cfg = make_cfg(tokenizer)
    params = dual_ar.init_dual_ar(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    batch = {k: jnp.asarray(v) for k, v in make_batch(cfg).items()}
    opt = make_optimizer(lr=1e-2, params=params)
    opt_state = opt.init(params)
    step = jax.jit(make_train_step(cfg, opt))
    losses = []
    for _ in range(12):
        params, opt_state, metrics = step(params, opt_state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.7, losses


def test_top5_rank_count_matches_topk(tokenizer):
    """The rank-count top-5 accuracy (loss.py — avoids sorting the vocab
    axis; the lax.top_k lowering cost 40 ms/step on the flagship finetune)
    must equal lax.top_k membership for distinct logits."""
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.standard_normal((3, 7, 4, 33)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 33, size=(3, 7, 4)))
    top5 = jax.lax.top_k(logits, 5)[1]
    ref = jnp.any(top5 == labels[..., None], axis=-1)
    label_logit = jnp.take_along_axis(logits, labels[..., None], axis=-1)
    got = (logits > label_logit).sum(axis=-1) < 5
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_loss_respects_masks(tokenizer):
    cfg = make_cfg(tokenizer)
    params = dual_ar.init_dual_ar(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    batch = make_batch(cfg)
    # setting labels at padded positions to junk must not change the loss
    batch2 = {k: v.copy() for k, v in batch.items()}
    batch2["labels"][:, :, -4:] = -100  # already ignored
    l1 = dual_ar_loss(params, cfg, {k: jnp.asarray(v) for k, v in batch.items()})[0]
    l2 = dual_ar_loss(params, cfg, {k: jnp.asarray(v) for k, v in batch2.items()})[0]
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)


def test_trainer_end_to_end_with_resume(tokenizer, tmp_path):
    from fish_speech_tpu.data.dataset import (
        DataLoader,
        SemanticIterableDataset,
        TextDataCollator,
    )

    proto = make_proto_file(tmp_path / "d.protos")
    cfg = make_cfg(tokenizer)
    tcfg = TrainConfig(
        output_dir=str(tmp_path / "out"), project="t", max_steps=4,
        batch_size=2, max_length=128, lr=1e-3, warmup_steps=1,
        ckpt_every_steps=2, log_every_steps=2, precision="float32",
        dp=1, tp=1, val_every_steps=1000,
    )
    ds = SemanticIterableDataset(
        [str(proto)], tokenizer, max_length=128, num_codebooks=cfg.num_codebooks
    )
    loader = DataLoader(ds, 2, TextDataCollator(tokenizer, 128))

    trainer = Trainer(cfg, tcfg, params=None)
    trainer.fit(loader, resume=False)
    assert trainer.step == 4
    ckpts = sorted((tmp_path / "out" / "t" / "checkpoints").glob("step_*"))
    assert len(ckpts) == 2  # steps 2 and 4
    assert (tmp_path / "out" / "t" / "metrics.jsonl").exists()

    # resume continues from step 4
    tcfg2 = TrainConfig(**{**tcfg.__dict__, "max_steps": 6})
    trainer2 = Trainer(cfg, tcfg2, params=None)
    trainer2.fit(loader, resume=True)
    assert trainer2.step == 6


def test_lora_optimizer_state_only_for_trainable(tokenizer):
    """LoRA fine-tuning must NOT allocate AdamW m/v for frozen leaves:
    full f32 optimizer state for the 5B flagship is ~40 GB and cannot
    live on a single 16 GB chip (this OOMed `bench.py --train` before
    `make_optimizer(trainable_mask=...)`). Frozen leaves must hold optax
    MaskedNode placeholders, trainable leaves real f32 moments."""
    import jax
    import jax.numpy as jnp
    import optax

    from fish_speech_tpu.models import dual_ar
    from fish_speech_tpu.models.lora import LoraConfig, add_lora, lora_filter
    from fish_speech_tpu.train.step import make_optimizer

    cfg = make_cfg(tokenizer)
    params = dual_ar.init_dual_ar(jax.random.PRNGKey(0), cfg,
                                  dtype=jnp.bfloat16)
    params = add_lora(params, cfg, LoraConfig(r=4, lora_alpha=8.0), jax.random.PRNGKey(1),
                      dtype=jnp.bfloat16)
    trainable = lora_filter(params)
    opt = make_optimizer(lr=1e-4, params=params, trainable_mask=trainable)
    state = opt.init(params)

    n_total = sum(x.size for x in jax.tree_util.tree_leaves(params))
    n_train = sum(
        p.size
        for p, t in zip(
            jax.tree_util.tree_leaves(params),
            jax.tree_util.tree_leaves(trainable),
        )
        if t
    )
    # moment arrays in the state must cover exactly the trainable leaves
    state_elems = sum(
        x.size
        for x in jax.tree_util.tree_leaves(state)
        if hasattr(x, "size") and getattr(x, "ndim", 0) > 0
    )
    assert n_train < n_total / 10  # LoRA is a small fraction
    assert state_elems <= 2 * n_train + 16, (
        f"optimizer state holds {state_elems} elements for "
        f"{n_train} trainable params — frozen leaves got moments"
    )
    # and a step still runs (mask plumbing is consistent)
    from fish_speech_tpu.train.step import make_train_step

    step = jax.jit(make_train_step(cfg, opt, trainable_filter=trainable))
    batch = {k: jnp.asarray(v) for k, v in make_batch(cfg).items()}
    params2, state2, metrics = step(params, state, batch)
    assert np.isfinite(float(metrics["loss"]))


def test_lora_training_only_updates_lora(tokenizer, tmp_path):
    cfg = make_cfg(tokenizer)
    tcfg = TrainConfig(
        output_dir=str(tmp_path / "out"), project="l", max_steps=2,
        batch_size=2, max_length=64, lr=1e-2, warmup_steps=1,
        ckpt_every_steps=100, log_every_steps=100, precision="float32",
        dp=1, tp=1, lora=LoraConfig(r=2, lora_alpha=4),
    )
    trainer = Trainer(cfg, tcfg, params=None)
    before = jax.device_get(trainer.params)

    batch = make_batch(trainer.cfg, t=32)

    class OneBatch:
        def __iter__(self):
            while True:
                yield batch

    trainer.fit(OneBatch(), resume=False)
    after = jax.device_get(trainer.params)

    flat_b = jax.tree_util.tree_flatten_with_path(before)[0]
    flat_a = jax.tree_util.tree_flatten_with_path(after)[0]
    changed_lora = unchanged_base = 0
    for (path_b, b), (path_a, a) in zip(flat_b, flat_a):
        is_lora = any("lora" in str(getattr(p, "key", p)) for p in path_b)
        same = np.array_equal(np.asarray(b), np.asarray(a))
        if is_lora and not same:
            changed_lora += 1
        if not is_lora:
            assert same, f"base weight changed: {path_b}"
            unchanged_base += 1
    assert changed_lora > 0 and unchanged_base > 0


def test_grad_accum_matches_big_batch(tokenizer):
    """N accumulated microbatches == one N-x batch: same loss trajectory and
    (near-)identical params. Exact when every microbatch carries the same
    loss-token count, so build batches with NO ignored positions."""
    cfg = make_cfg(tokenizer)
    rng = np.random.default_rng(3)
    b, t = 4, 24
    inputs = np.zeros((b, cfg.num_codebooks + 1, t), dtype=np.int32)
    inputs[:, 0] = rng.integers(4, 200, size=(b, t))
    labels = inputs.copy()
    full = {"inputs": inputs, "labels": labels,
            "pad_mask": np.zeros((b, t), dtype=bool)}
    stacked = {k: v.reshape(2, 2, *v.shape[1:]) for k, v in full.items()}

    def run(step_fn, batch, n=4):
        params = dual_ar.init_dual_ar(jax.random.PRNGKey(0), cfg,
                                      dtype=jnp.float32)
        opt = make_optimizer(lr=1e-3, params=params)
        opt_state = opt.init(params)
        losses = []
        for _ in range(n):
            params, opt_state, m = step_fn(params, opt_state,
                                           {k: jnp.asarray(v) for k, v in batch.items()})
            losses.append(float(m["loss"]))
        return params, losses

    opt_probe = make_optimizer(lr=1e-3)
    step_big = jax.jit(make_train_step(cfg, make_optimizer(lr=1e-3)))
    step_acc = jax.jit(make_train_step(cfg, make_optimizer(lr=1e-3),
                                       grad_accum=2))
    p_big, l_big = run(step_big, full)
    p_acc, l_acc = run(step_acc, stacked)

    np.testing.assert_allclose(l_acc, l_big, rtol=1e-5, atol=1e-5)
    for (path1, a), (_, b_) in zip(
        jax.tree_util.tree_flatten_with_path(p_big)[0],
        jax.tree_util.tree_flatten_with_path(p_acc)[0],
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-5, err_msg=str(path1))


def test_trainer_grad_accum_loop(tokenizer, tmp_path):
    """Trainer.fit with grad_accum_steps pulls N microbatches per step and
    converges on a fixed batch."""
    cfg = make_cfg(tokenizer)
    tcfg = TrainConfig(
        output_dir=str(tmp_path), project="acc", max_steps=6, batch_size=2,
        grad_accum_steps=2, lr=1e-2, warmup_steps=0, log_every_steps=2,
        ckpt_every_steps=100, precision="float32", dp=2,
    )
    trainer = Trainer(cfg, tcfg)
    batch = make_batch(cfg)

    def loader():
        while True:
            yield batch

    trainer.fit(loader(), resume=False)
    log = (tmp_path / "acc" / "metrics.jsonl").read_text().strip().splitlines()
    import json as _json

    recs = [_json.loads(x) for x in log if "loss" in _json.loads(x)]
    assert recs and recs[-1]["loss"] < recs[0]["loss"]


def test_zero1_shards_opt_state_and_matches_replicated(tokenizer, tmp_path):
    """ZeRO-1 (`--zero1`): AdamW m/v shard over the dp axis (per-replica
    optimizer memory ~/dp, GSPMD compiles reduce-scatter + sharded update
    + all-gather), and the training trajectory matches the replicated
    baseline step for step."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    cfg = make_cfg(tokenizer)
    base = TrainConfig(
        output_dir=str(tmp_path / "out"), project="z", max_steps=3,
        batch_size=4, max_length=128, lr=1e-3, warmup_steps=1,
        precision="float32", dp=4, tp=2, val_every_steps=1000,
    )
    tr_a = Trainer(cfg, base, params=None)
    tr_b = Trainer(cfg, TrainConfig(**{**base.__dict__, "zero1": True}),
                   params=None)

    from fish_speech_tpu.parallel.mesh import sharding_axis_names as spec_names

    # the dp-sharded state exists in the zero1 trainer and not the baseline
    leaves_a = [x for x in jax.tree_util.tree_leaves(tr_a.opt_state)
                if hasattr(x, "sharding") and x.ndim >= 2]
    leaves_b = [x for x in jax.tree_util.tree_leaves(tr_b.opt_state)
                if hasattr(x, "sharding") and x.ndim >= 2]
    assert not any("dp" in spec_names(x) for x in leaves_a)
    n_dp = sum("dp" in spec_names(x) for x in leaves_b)
    assert n_dp > 0, "no optimizer-state leaf is dp-sharded"
    # per-replica memory: the largest state leaf's addressable shard is
    # dp-times smaller than the replicated trainer's
    big_a = max(leaves_a, key=lambda x: x.size)
    big_b = max(leaves_b, key=lambda x: x.size)
    assert big_a.size == big_b.size
    shard_a = big_a.addressable_shards[0].data.size
    shard_b = big_b.addressable_shards[0].data.size
    assert shard_b * 4 == shard_a, (shard_a, shard_b)

    batch = make_batch(cfg, b=4)
    losses_a, losses_b = [], []
    for _ in range(3):
        ba = tr_a._place_batch(batch, tr_a.bspecs)
        tr_a.params, tr_a.opt_state, ma = tr_a.train_step(
            tr_a.params, tr_a.opt_state, ba)
        bb = tr_b._place_batch(batch, tr_b.bspecs)
        tr_b.params, tr_b.opt_state, mb = tr_b.train_step(
            tr_b.params, tr_b.opt_state, bb)
        losses_a.append(float(ma["loss"]))
        losses_b.append(float(mb["loss"]))
    np.testing.assert_allclose(losses_a, losses_b, rtol=2e-5)
    # parameters track each other through the sharded update
    fa = jax.tree_util.tree_leaves(tr_a.params)[0]
    fb = jax.tree_util.tree_leaves(tr_b.params)[0]
    np.testing.assert_allclose(np.asarray(fa), np.asarray(fb),
                               rtol=1e-4, atol=1e-5)
    # the zero1 state stayed dp-sharded across donated steps
    leaves_b2 = [x for x in jax.tree_util.tree_leaves(tr_b.opt_state)
                 if hasattr(x, "sharding") and x.ndim >= 2]
    assert sum("dp" in spec_names(x) for x in leaves_b2) == n_dp


def test_zero1_checkpoint_roundtrip(tokenizer, tmp_path):
    """The dp-sharded optimizer state survives an orbax save/restore
    (StandardCheckpointer restores with the target's shardings, and the
    restore target is the freshly-init zero1-sharded state) and training
    continues on the same trajectory as an uninterrupted run."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    cfg = make_cfg(tokenizer)
    zcfg = TrainConfig(
        output_dir=str(tmp_path / "out"), project="zr", max_steps=3,
        batch_size=4, max_length=128, lr=1e-3, warmup_steps=1,
        precision="float32", dp=4, tp=2, val_every_steps=1000, zero1=True,
    )
    batch = make_batch(cfg, b=4)

    from fish_speech_tpu.parallel.mesh import sharding_axis_names as spec_names

    def run_steps(tr, n):
        for _ in range(n):
            b = tr._place_batch(batch, tr.bspecs)
            tr.params, tr.opt_state, _ = tr.train_step(
                tr.params, tr.opt_state, b)
            tr.step += 1

    # uninterrupted 3-step run
    tr_full = Trainer(cfg, zcfg, params=None)
    run_steps(tr_full, 3)

    # 2 steps, checkpoint, restore into a fresh trainer, 1 more step
    tr_pre = Trainer(cfg, zcfg, params=None)
    run_steps(tr_pre, 2)
    tr_pre.save_checkpoint()

    tr_post = Trainer(cfg, zcfg, params=None)
    assert tr_post.restore_checkpoint()
    assert tr_post.step == 2
    # restored state is still dp-sharded (not silently replicated)
    leaves = [x for x in jax.tree_util.tree_leaves(tr_post.opt_state)
              if hasattr(x, "sharding") and x.ndim >= 2]
    assert sum("dp" in spec_names(x) for x in leaves) > 0
    run_steps(tr_post, 1)

    fa = jax.tree_util.tree_leaves(tr_full.params)[0]
    fb = jax.tree_util.tree_leaves(tr_post.params)[0]
    np.testing.assert_allclose(np.asarray(fa), np.asarray(fb),
                               rtol=1e-5, atol=1e-6)


def test_resume_is_bit_equivalent(tokenizer, tmp_path):
    """Interrupted training is EXACTLY the uninterrupted run: 4 steps
    straight vs 2 steps -> orbax checkpoint -> fresh Trainer -> restore ->
    2 more steps on the same remaining batches must produce bit-identical
    params and optimizer state (f32 CPU: same jitted program both ways, so
    any delta is a checkpoint round-trip loss — m/v, the AdamW step count
    driving the warmup schedule, or the step counter)."""
    cfg = make_cfg(tokenizer)
    batches = [make_batch(cfg, np.random.default_rng(100 + i)) for i in range(4)]

    def tc(outdir, max_steps):
        return TrainConfig(
            output_dir=str(tmp_path / outdir), project="t",
            max_steps=max_steps, batch_size=2, max_length=32, lr=1e-3,
            warmup_steps=2, ckpt_every_steps=2, log_every_steps=100,
            precision="float32", dp=1, tp=1, val_every_steps=1000,
        )

    t_a = Trainer(cfg, tc("a", 4), params=None)
    t_a.fit(list(batches), resume=False)

    t_b = Trainer(cfg, tc("b", 2), params=None)
    t_b.fit(batches[:2], resume=False)
    t_b2 = Trainer(cfg, tc("b", 4), params=None)
    t_b2.fit(batches[2:], resume=True)

    assert t_a.step == t_b2.step == 4

    flat_a = jax.tree_util.tree_leaves_with_path(t_a.params)
    flat_b = jax.tree_util.tree_leaves_with_path(t_b2.params)
    assert len(flat_a) == len(flat_b)
    for (ka, va), (_, vb) in zip(flat_a, flat_b):
        np.testing.assert_array_equal(
            np.asarray(va), np.asarray(vb), err_msg=jax.tree_util.keystr(ka)
        )

    oa = jax.tree_util.tree_leaves(t_a.opt_state)
    ob = jax.tree_util.tree_leaves(t_b2.opt_state)
    assert len(oa) == len(ob)
    for va, vb in zip(oa, ob):
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))


def test_train_state_memory_plan_feasibility():
    """The pure-arithmetic HBM plan behind docs/en/finetune.md's chip-count
    table (VERDICT r4 item 1): full FT of the 4.97B flagship is ~8 bytes/
    param of persistent state; no dp-only layout fits a 16 GB v5e (params+
    grads replicate), while (dp=2, tp=4) + ZeRO-1 plans well under half a
    chip. The mid config the full-FT bench uses fits a single chip."""
    from fish_speech_tpu.config import dual_ar_s2_pro
    from fish_speech_tpu.parallel.mesh import train_state_memory_plan

    flagship = dual_ar_s2_pro(
        semantic_begin_id=151000, semantic_end_id=155095, im_end_id=150994
    )
    single = train_state_memory_plan(flagship)
    assert single["bytes_per_param_per_chip"] == 8.0
    assert single["total_gib"] > 16.0

    dp_only = train_state_memory_plan(flagship, dp=8, zero1=True)
    assert dp_only["params_gib"] == single["params_gib"]  # replicated
    assert dp_only["total_gib"] > 16.0

    sharded = train_state_memory_plan(flagship, dp=2, tp=4, zero1=True)
    assert sharded["total_gib"] < 0.6 * 16.0
    # tp divides the Megatron-sharded leaves; zero1 additionally divides
    # m/v by dp, so opt state is ~params_bytes (2 leaves / (tp*dp) vs
    # 1 leaf / tp)
    assert sharded["opt_gib"] <= sharded["params_gib"] * 1.05

    import dataclasses
    import sys

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parents[1]))
    from bench import _dual_ar_mid

    mid = _dual_ar_mid(semantic_begin_id=151000, semantic_end_id=155095,
                       im_end_id=150994)
    plan = train_state_memory_plan(mid)
    assert plan["total_gib"] < 12.0, plan  # + activations stays inside 16
