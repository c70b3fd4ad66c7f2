"""GPipe pipeline parallelism for the wav2vec2 encoder layer stack.

The reference has no distributed training at all (SURVEY.md §5: every
device string is a hard-coded "cuda:0"). The TPU trainer scales first by
data parallelism and optionally tensor parallelism (parallel/mesh.py);
this module adds the third axis from the ROADMAP — pipeline parallelism
over the 12 identical EncoderLayerStableLN blocks. wav2vec2-large (~300M
params) fits one v5e chip, so this is the scale-out OPTION for larger
future encoder families, off by default.

Design (TPU-idiomatic; the scaling-book pipelining recipe, not a port of
anything in the reference):

- the L encoder layers' parameters are STACKED on a new leading axis and
  sharded over the mesh's "pipe" axis, so each stage holds L/S
  consecutive layers and HBM per chip scales as 1/S;
- one ``shard_map`` runs the whole GPipe schedule: ``lax.scan`` over
  ``n_micro + S - 1`` ticks, each tick applying the local stage (an inner
  ``lax.scan`` over its L/S layers) and handing activations to the next
  stage with a single ``ppermute`` hop over ICI;
- microbatches ride the batch axis, which stays sharded over "data" — so
  dp x pp compose inside the same program and XLA still inserts the
  gradient psum over both axes;
- the pipeline bubble is the standard (S-1)/(n_micro + S - 1) fraction;
  callers pick ``n_micro`` (more microbatches = smaller bubble, smaller
  per-tick matmuls);
- the finished hidden states are returned replicated across stages via a
  one-hot-masked ``psum`` (one activation-sized all-reduce; the batch is
  small relative to weights, and it keeps the result layout identical to
  the sequential path for the downstream head).

Everything is differentiable (ppermute/scan/psum all have transposes), so
``jax.value_and_grad`` through a pipelined forward works — the
equivalence tests in tests/test_pipeline_pp.py check logits AND gradients
against the plain sequential encoder.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh_dp_pp(data: int = -1, pipe: int = 1, devices=None) -> Mesh:
    """A (data, pipe) mesh. data=-1 uses all remaining devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if data == -1:
        data = n // pipe
    if data * pipe > n:
        raise ValueError(f"mesh {data}x{pipe} exceeds {n} devices")
    grid = devices[: data * pipe].reshape(data, pipe)
    return Mesh(grid, axis_names=("data", "pipe"))


def stack_layers(encoder_params: dict, num_layers: int) -> Any:
    """``{'layers_0': tree, ..., 'layers_{L-1}': tree}`` -> one tree whose
    leaves gain a leading [L] axis (the axis sharded over "pipe")."""
    trees = [encoder_params[f"layers_{i}"] for i in range(num_layers)]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)


def unstack_layers(stacked: Any, num_layers: int) -> dict:
    """Inverse of :func:`stack_layers` (for checkpoint round-trips and for
    mapping pipelined gradients back onto the named parameter tree)."""
    return {
        f"layers_{i}": jax.tree.map(lambda x, i=i: x[i], stacked)
        for i in range(num_layers)
    }


def shard_stacked(stacked: Any, mesh: Mesh) -> Any:
    """Place a stacked layer tree with its leading axis over "pipe"."""
    def put(leaf):
        return jax.device_put(
            leaf, NamedSharding(mesh, P("pipe", *([None] * (leaf.ndim - 1))))
        )
    return jax.tree.map(put, stacked)


def gpipe_apply(
    mesh: Mesh,
    layer_module,
    stacked_params: Any,
    h: jax.Array,  # [B, T, H], batch sharded over "data"
    n_micro: int,
    deterministic: bool = True,
    rng: Optional[jax.Array] = None,
) -> jax.Array:
    """Run ``layer_module`` (one encoder layer) L times, pipelined over the
    mesh's "pipe" axis with a GPipe schedule. Exact same math as the
    sequential ``for i in range(L): h = layer(h)`` loop."""
    if "pipe" not in mesh.axis_names:
        raise ValueError(f"mesh {mesh.axis_names} has no 'pipe' axis")
    if "data" not in mesh.axis_names:
        raise ValueError(f"mesh {mesh.axis_names} has no 'data' axis")
    n_stages = mesh.shape["pipe"]
    num_layers = jax.tree.leaves(stacked_params)[0].shape[0]
    if num_layers % n_stages:
        raise ValueError(
            f"{num_layers} layers do not divide over {n_stages} stages"
        )
    data_size = mesh.shape["data"]
    batch = h.shape[0]
    if batch % (data_size * n_micro):
        raise ValueError(
            f"batch {batch} must divide data={data_size} x n_micro={n_micro}"
        )
    use_rng = rng is not None
    rng = rng if use_rng else jax.random.PRNGKey(0)
    layers_per_stage = num_layers // n_stages

    def fn(stacked_local, h_local, rng_in):
        # Replication is TRACKED (check_vma=True below) so that the
        # transpose of each pipe-invariant input inserts the psum over
        # "pipe" — without it, d(loss)/d(h) silently drops every stage-0
        # queue contribution and the pre-layer gradients come out wrong
        # (caught by tests/test_pipeline_pp.py::test_grad_equivalence).
        stacked_local = jax.tree.map(
            lambda t: jax.lax.pcast(t, "data", to="varying"), stacked_local
        )
        h_local = jax.lax.pcast(h_local, "pipe", to="varying")
        rng_in = jax.lax.pcast(rng_in, ("data", "pipe"), to="varying")
        stage = jax.lax.pcast(
            jax.lax.axis_index("pipe"), "data", to="varying"
        )
        dshard = jax.lax.pcast(
            jax.lax.axis_index("data"), "pipe", to="varying"
        )
        mb = h_local.reshape(n_micro, -1, *h_local.shape[1:])
        # stage 0 consumes real microbatches for the first n_micro ticks,
        # then padding while the tail drains through the later stages
        queue = jnp.concatenate(
            [mb, jnp.zeros((n_stages - 1, *mb.shape[1:]), mb.dtype)], 0
        )

        def apply_stage(x, tick):
            def layer_body(carry, xs):
                lp, li = xs
                if use_rng:
                    # unique dropout stream per (data shard, tick, stage,
                    # local layer) — without the data-shard fold the same
                    # row positions of every dp shard would draw identical
                    # masks (correlated regularization the sequential path
                    # doesn't have)
                    r = jax.random.fold_in(
                        jax.random.fold_in(
                            jax.random.fold_in(
                                jax.random.fold_in(rng_in, dshard), tick
                            ),
                            stage,
                        ),
                        li,
                    )
                    y = layer_module.apply(
                        {"params": lp}, carry, deterministic,
                        rngs={"dropout": r},
                    )
                else:
                    y = layer_module.apply({"params": lp}, carry, deterministic)
                return y, None

            layer_idx = jax.lax.pcast(
                jnp.arange(layers_per_stage), ("data", "pipe"), to="varying"
            )
            y, _ = jax.lax.scan(layer_body, x, (stacked_local, layer_idx))
            return y

        def tick_fn(recv, xs):
            tick, inp = xs
            # stage 0 reads the input queue; later stages read what the
            # previous stage handed over at the end of the last tick
            x_in = jnp.where(stage == 0, inp, recv)
            out = apply_stage(x_in, tick)
            nxt = jax.lax.ppermute(
                out, "pipe", [(i, (i + 1) % n_stages) for i in range(n_stages)]
            )
            return nxt, out

        ticks = jax.lax.pcast(
            jnp.arange(n_micro + n_stages - 1), ("data", "pipe"), to="varying"
        )
        _, outs = jax.lax.scan(tick_fn, jnp.zeros_like(mb[0]), (ticks, queue))
        # microbatch m finishes on the LAST stage at tick m + S - 1
        sel = outs[n_stages - 1:]
        full = jax.lax.psum(
            jnp.where(stage == n_stages - 1, sel, jnp.zeros_like(sel)), "pipe"
        )
        return full.reshape(h_local.shape)

    # batch stays sharded over "data"; stacked layer params shard their
    # leading [L] axis over "pipe" (replicated over "data"); any other mesh
    # axes see replication
    return jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=(P("pipe"), P("data"), P()),
        out_specs=P("data"),
        check_vma=True,
    )(stacked_params, h, rng)


def wav2vec2_hidden_pipelined(
    encoder_module,
    encoder_params: dict,
    wav: jax.Array,
    mesh: Mesh,
    n_micro: int,
    deterministic: bool = True,
    rng: Optional[jax.Array] = None,
) -> jax.Array:
    """Full wav2vec2 forward with the layer stack pipelined: the conv
    extractor / projection / positional embedding run data-parallel
    ("pre_layers" mode), the L encoder layers run GPipe over "pipe", and
    the final LayerNorm runs data-parallel ("post_layers" mode). Same
    parameter tree and same math as ``mode='full'``."""
    from avcer_tpu.models.wav2vec2 import EncoderLayerStableLN

    cfg = encoder_module.config
    if cfg.quant:
        raise ValueError("pipeline parallelism is a training/serving-exact "
                         "path; int8 act_scales are not threaded through it")
    rngs = {"dropout": rng} if rng is not None else None
    h = encoder_module.apply(
        {"params": encoder_params}, wav, deterministic, mode="pre_layers",
        rngs=rngs,
    )
    layer_mod = EncoderLayerStableLN(cfg, dtype=encoder_module.dtype)
    stacked = stack_layers(encoder_params, cfg.num_layers)
    h = gpipe_apply(mesh, layer_mod, stacked, h, n_micro, deterministic, rng)
    return encoder_module.apply(
        {"params": encoder_params}, h, deterministic, mode="post_layers"
    )


def stack_encoder_params(params: dict, num_layers: int) -> dict:
    """ExprModel param tree -> the pp-trainer layout: the wav2vec2
    ``layers_{i}`` subtrees merge into one ``layers_stacked`` subtree whose
    leaves carry a leading [L] axis (sharded ``P('pipe')`` on the mesh, so
    params, grads and Adam moments for the encoder stack — ~85% of
    wav2vec2-large — all scale as 1/n_stages per chip). Inverse:
    :func:`unstack_encoder_params` (checkpoint export / conversion)."""
    p = dict(params)
    enc = dict(p["wav2vec2"])
    stacked = stack_layers(enc, num_layers)
    for i in range(num_layers):
        del enc[f"layers_{i}"]
    enc["layers_stacked"] = stacked
    p["wav2vec2"] = enc
    return p


def unstack_encoder_params(params: dict, num_layers: int) -> dict:
    """Inverse of :func:`stack_encoder_params` — back to the named tree the
    converters/checkpoints/serving stages use."""
    p = dict(params)
    enc = dict(p["wav2vec2"])
    stacked = enc.pop("layers_stacked")
    enc.update(unstack_layers(stacked, num_layers))
    p["wav2vec2"] = enc
    return p


def expr_logits_stacked(
    model,
    params: dict,
    batch_stats: dict,
    wav: jax.Array,
    mesh: Mesh,
    n_micro: int,
    deterministic: bool = True,
    rng: Optional[jax.Array] = None,
    mutable=False,
    **head_kwargs,
):
    """ExprModel forward on the pp-trainer STACKED param layout (see
    :func:`stack_encoder_params`): pre/post encoder pieces run data-parallel
    from the named tree, the layer stack runs GPipe directly from the
    pipe-sharded stacked leaves (no per-step stack/unstack traffic), and the
    head consumes the replicated hidden states in ``w2v_mode='hidden'``.
    ``head_kwargs`` pass through to the head apply (``return_features``)."""
    from avcer_tpu.models.wav2vec2 import EncoderLayerStableLN, Wav2Vec2Encoder

    cfg = model.wav2vec2_config
    enc = Wav2Vec2Encoder(cfg, dtype=model.dtype)
    enc_named = dict(params["wav2vec2"])
    stacked = enc_named.pop("layers_stacked")
    rngs = {"dropout": rng} if rng is not None else None
    h = enc.apply(
        {"params": enc_named}, wav, deterministic, mode="pre_layers", rngs=rngs
    )
    layer_mod = EncoderLayerStableLN(cfg, dtype=model.dtype)
    h = gpipe_apply(mesh, layer_mod, stacked, h, n_micro, deterministic, rng)
    h = enc.apply({"params": enc_named}, h, deterministic, mode="post_layers")
    head_vars = {"params": params}
    if batch_stats:
        head_vars["batch_stats"] = batch_stats
    return model.apply(
        head_vars, h, deterministic=deterministic, w2v_mode="hidden",
        rngs=rngs, mutable=mutable, **head_kwargs,
    )


def expr_logits_pipelined(
    model,
    variables: dict,
    wav: jax.Array,
    mesh: Mesh,
    n_micro: int,
    deterministic: bool = True,
    rng: Optional[jax.Array] = None,
    mutable=False,
) -> jax.Array:
    """ExprModel forward (models/audio_heads.py) with the wav2vec2 encoder
    pipelined and the (tiny) temporal head running data-parallel on the
    replicated final hidden states — the product-level entry used by the
    pp equivalence tests and the multi-chip dryrun.

    ``mutable`` passes through to the head apply (train mode needs
    ``mutable=["batch_stats"]`` for the TimeDownsample BatchNorms, in which
    case flax returns ``(logits, updates)``). The wav2vec2 encoder itself
    has no mutable collections."""
    from avcer_tpu.models.wav2vec2 import Wav2Vec2Encoder

    enc = Wav2Vec2Encoder(model.wav2vec2_config, dtype=model.dtype)
    h = wav2vec2_hidden_pipelined(
        enc, variables["params"]["wav2vec2"], wav, mesh, n_micro,
        deterministic, rng,
    )
    rngs = {"dropout": rng} if rng is not None else None
    return model.apply(
        variables, h, deterministic=deterministic, w2v_mode="hidden",
        rngs=rngs, mutable=mutable,
    )
