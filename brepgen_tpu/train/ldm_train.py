"""LDM training steps for the four cascaded denoisers.

Each step fuses, into ONE jitted function per stage (so everything runs in
a single XLA program on device):
  * frozen VAE fast-encode of the conditioning geometry (mode(), reference
    ``trainer.py:519-524,919-929``),
  * condition augmentation -- conditioning tensors re-noised at a random
    t in [0, 15) per arXiv 2106.15282 (reference ``trainer.py:509-516,
    711-718,932-939``),
  * forward noising at t ~ U[0, 1000) and the eps-prediction loss, masked
    by the stage's key-padding mask (``trainer.py:537,732,953``).

Batch convention: dict of numpy/jax arrays with keys (per stage)
  surfpos [B,nf,6], surfpnt [B,nf,32,32,3], surf_mask [B,nf],
  edgepos [B,nf,ne,6], edgepnt [B,nf,ne,32,3], edge_mask [B,nf,ne],
  vertpos [B,nf,ne,6], class_label [B,1] (optional).

Precomputed-latent path (SURVEY hard part 4; ``data/latent_cache.py``):
when the batch carries "surfz" [B,nf,48] / "edgez" [B,nf,ne,12] instead
of surfpnt/edgepnt, the in-step frozen-VAE encode is skipped (the branch
is resolved at trace time from the dict keys). Only valid with rotation
augmentation off — the encoders are deterministic but their inputs are
not under aug.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from brepgen_tpu.diffusion import DDPMTables, add_noise
from brepgen_tpu.nn.denoiser import broadcast_face_to_edge, flatten_face_edge
from brepgen_tpu.train.common import TrainState, apply_updates, masked_mse

AUG_MAX_T = 15
VAL_STEPS_SURF = (10, 50, 100, 200, 500)
VAL_STEPS_EDGE = (10, 50, 100)


def _augment_condition(tables: DDPMTables, rng, x):
    """Re-noise one conditioning tensor at t ~ U[0, 15)."""
    k_t, k_n = jax.random.split(rng)
    B = x.shape[0]
    t = jax.random.randint(k_t, (B,), 0, AUG_MAX_T)
    noise = jax.random.normal(k_n, x.shape, x.dtype)
    return add_noise(tables, x, noise, t)


def _train_rngs(rng, use_cf):
    names = ["t", "noise", "dropout"] + (["cfg"] if use_cf else []) + ["aug"]
    keys = jax.random.split(rng, len(names))
    return dict(zip(names, keys))


def _encode_surf(surf_encode, vae_params, surfpnt):
    """[B, nf, 32, 32, 3] -> [B, nf, 48] via the frozen surface VAE."""
    B, nf = surfpnt.shape[:2]
    z = surf_encode(vae_params, surfpnt.reshape(B * nf, 32, 32, 3))
    return z.reshape(B, nf, 48)


def _encode_edge(edge_encode, vae_params, edgepnt):
    """[B, nf, ne, 32, 3] -> [B, nf, ne, 12] via the frozen edge VAE."""
    B, nf, ne = edgepnt.shape[:3]
    z = edge_encode(vae_params, edgepnt.reshape(B * nf * ne, 32, 3))
    return z.reshape(B, nf, ne, 12)


def _model_rngs(r, use_cf):
    rngs = {"dropout": r["dropout"]}
    if use_cf:
        rngs["cfg"] = r["cfg"]
    return rngs


# ---------------------------------------------------------------------------


def make_surfpos_step(model, optimizer, tables: DDPMTables, use_cf: bool = False):
    @jax.jit
    def step(state: TrainState, batch, rng):
        r = _train_rngs(rng, use_cf)
        x = batch["surfpos"]
        B = x.shape[0]
        t = jax.random.randint(r["t"], (B,), 0, tables.num_train_timesteps)
        noise = jax.random.normal(r["noise"], x.shape, x.dtype)
        x_t = add_noise(tables, x, noise, t)

        def loss_fn(params):
            pred = model.apply(
                params, (x_t,), t, None, batch.get("class_label"), True,
                rngs=_model_rngs(r, use_cf),
            )
            return jnp.mean(jnp.square(pred - noise))

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return apply_updates(state, grads, optimizer), {"loss": loss}

    return step


def make_surfz_step(
    model, optimizer, tables: DDPMTables, surf_encode, surf_vae_params, use_cf=False
):
    @jax.jit
    def step(state: TrainState, batch, rng):
        r = _train_rngs(rng, use_cf)
        surfpos = batch["surfpos"]
        mask = batch["surf_mask"]
        B = surfpos.shape[0]

        surfz = (batch["surfz"] if "surfz" in batch else
                 _encode_surf(surf_encode, surf_vae_params, batch["surfpnt"]))
        surfpos = _augment_condition(tables, r["aug"], surfpos)

        t = jax.random.randint(r["t"], (B,), 0, tables.num_train_timesteps)
        noise = jax.random.normal(r["noise"], surfz.shape, surfz.dtype)
        x_t = add_noise(tables, surfz, noise, t)

        def loss_fn(params):
            pred = model.apply(
                params, (x_t, surfpos), t, mask, batch.get("class_label"), True,
                rngs=_model_rngs(r, use_cf),
            )
            return masked_mse(pred, noise, mask)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return apply_updates(state, grads, optimizer), {"loss": loss}

    return step


def make_edgepos_step(
    model, optimizer, tables: DDPMTables, surf_encode, surf_vae_params, use_cf=False
):
    @jax.jit
    def step(state: TrainState, batch, rng):
        r = _train_rngs(rng, use_cf)
        surfpos = batch["surfpos"]
        edgepos = batch["edgepos"]  # [B, nf, ne, 6]
        mask = batch["surf_mask"]   # [B, nf]
        B, nf, ne, _ = edgepos.shape

        surfz = (batch["surfz"] if "surfz" in batch else
                 _encode_surf(surf_encode, surf_vae_params, batch["surfpnt"]))
        k1, k2 = jax.random.split(r["aug"])
        surfpos = _augment_condition(tables, k1, surfpos)
        surfz = _augment_condition(tables, k2, surfz)

        t = jax.random.randint(r["t"], (B,), 0, tables.num_train_timesteps)
        noise = jax.random.normal(r["noise"], edgepos.shape, edgepos.dtype)
        x_t = add_noise(tables, edgepos, noise, t)

        tok_mask = jnp.repeat(mask, ne, axis=1)  # [B, nf*ne]

        def loss_fn(params):
            pred = model.apply(
                params,
                (
                    flatten_face_edge(x_t),
                    broadcast_face_to_edge(surfpos, ne),
                    broadcast_face_to_edge(surfz, ne),
                ),
                t,
                tok_mask,
                batch.get("class_label"),
                True,
                rngs=_model_rngs(r, use_cf),
            ).reshape(B, nf, ne, 6)
            # loss over valid FACES (all their edge slots), reference
            # trainer.py:732 indexes with ~surf_mask
            return masked_mse(pred, noise, jnp.broadcast_to(mask[:, :, None], (B, nf, ne)))

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return apply_updates(state, grads, optimizer), {"loss": loss}

    return step


def make_edgez_step(
    model,
    optimizer,
    tables: DDPMTables,
    surf_encode,
    surf_vae_params,
    edge_encode,
    edge_vae_params,
    use_cf=False,
):
    @jax.jit
    def step(state: TrainState, batch, rng):
        r = _train_rngs(rng, use_cf)
        surfpos = batch["surfpos"]
        edgepos = batch["edgepos"]
        edge_mask = batch["edge_mask"]  # [B, nf, ne]
        vertpos = batch["vertpos"]
        B, nf, ne, _ = edgepos.shape

        surfz = (batch["surfz"] if "surfz" in batch else
                 _encode_surf(surf_encode, surf_vae_params, batch["surfpnt"]))
        edgez = (batch["edgez"] if "edgez" in batch else
                 _encode_edge(edge_encode, edge_vae_params, batch["edgepnt"]))
        joint = jnp.concatenate([edgez, vertpos], -1)  # [B, nf, ne, 18]

        k1, k2, k3 = jax.random.split(r["aug"], 3)
        edgepos = _augment_condition(tables, k1, edgepos)
        surfpos = _augment_condition(tables, k2, surfpos)
        surfz = _augment_condition(tables, k3, surfz)

        t = jax.random.randint(r["t"], (B,), 0, tables.num_train_timesteps)
        noise = jax.random.normal(r["noise"], joint.shape, joint.dtype)
        x_t = add_noise(tables, joint, noise, t)

        tok_mask = edge_mask.reshape(B, nf * ne)

        def loss_fn(params):
            pred = model.apply(
                params,
                (
                    flatten_face_edge(x_t[..., :12]),
                    flatten_face_edge(x_t[..., 12:]),
                    flatten_face_edge(edgepos),
                    broadcast_face_to_edge(surfpos, ne),
                    broadcast_face_to_edge(surfz, ne),
                ),
                t,
                tok_mask,
                batch.get("class_label"),
                True,
                rngs=_model_rngs(r, use_cf),
            ).reshape(B, nf, ne, 18)
            total = masked_mse(pred, noise, edge_mask)
            loss_z = masked_mse(pred[..., :12], noise[..., :12], edge_mask)
            loss_v = masked_mse(pred[..., 12:], noise[..., 12:], edge_mask)
            return total, (loss_z, loss_v)

        (loss, (loss_z, loss_v)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        return apply_updates(state, grads, optimizer), {
            "loss": loss,
            "loss_z": loss_z,
            "loss_v": loss_v,
        }

    return step


# ---------------------------------------------------------------------------
# validation: masked eps-MSE at fixed timesteps (reference trainer.py:374-408 etc.)


def make_val_step(stage: str, model, tables, surf_encode=None, surf_vae_params=None,
                  edge_encode=None, edge_vae_params=None, use_cf=False):
    """Returns fn(params, batch, rng, t_fixed) -> per-batch summed token MSE
    and valid-token count, for averaging across the val set."""

    @jax.jit
    def val(params, batch, rng, t_fixed):
        k_n = rng
        label = batch.get("class_label")
        if stage == "surfpos":
            x = batch["surfpos"]
            B = x.shape[0]
            t = jnp.full((B,), t_fixed, jnp.int32)
            noise = jax.random.normal(k_n, x.shape, x.dtype)
            x_t = add_noise(tables, x, noise, t)
            pred = model.apply(params, (x_t,), t, None, label)
            per_sample = jnp.mean(jnp.square(pred - noise), axis=(1, 2))
            return jnp.sum(per_sample), jnp.asarray(B, jnp.float32)
        if stage == "surfz":
            x = (batch["surfz"] if "surfz" in batch else
                 _encode_surf(surf_encode, surf_vae_params, batch["surfpnt"]))
            mask = batch["surf_mask"]
            B = x.shape[0]
            t = jnp.full((B,), t_fixed, jnp.int32)
            noise = jax.random.normal(k_n, x.shape, x.dtype)
            x_t = add_noise(tables, x, noise, t)
            pred = model.apply(params, (x_t, batch["surfpos"]), t, mask, label)
            tok_mse = jnp.mean(jnp.square(pred - noise), axis=-1)
            w = (~mask).astype(jnp.float32)
            return jnp.sum(tok_mse * w), jnp.asarray(B, jnp.float32)
        if stage == "edgepos":
            surfz = (batch["surfz"] if "surfz" in batch else
                     _encode_surf(surf_encode, surf_vae_params, batch["surfpnt"]))
            x = batch["edgepos"]
            mask = batch["surf_mask"]
            B, nf, ne, _ = x.shape
            t = jnp.full((B,), t_fixed, jnp.int32)
            noise = jax.random.normal(k_n, x.shape, x.dtype)
            x_t = add_noise(tables, x, noise, t)
            pred = model.apply(
                params,
                (
                    flatten_face_edge(x_t),
                    broadcast_face_to_edge(batch["surfpos"], ne),
                    broadcast_face_to_edge(surfz, ne),
                ),
                t,
                jnp.repeat(mask, ne, axis=1),
                label,
            ).reshape(B, nf, ne, 6)
            tok_mse = jnp.mean(jnp.square(pred - noise), axis=-1)
            w = jnp.broadcast_to((~mask)[:, :, None], (B, nf, ne)).astype(jnp.float32)
            return jnp.sum(tok_mse * w), jnp.asarray(B, jnp.float32)
        if stage == "edgez":
            surfz = (batch["surfz"] if "surfz" in batch else
                     _encode_surf(surf_encode, surf_vae_params, batch["surfpnt"]))
            edgez = (batch["edgez"] if "edgez" in batch else
                     _encode_edge(edge_encode, edge_vae_params, batch["edgepnt"]))
            joint = jnp.concatenate([edgez, batch["vertpos"]], -1)
            edge_mask = batch["edge_mask"]
            B, nf, ne, _ = joint.shape
            t = jnp.full((B,), t_fixed, jnp.int32)
            noise = jax.random.normal(k_n, joint.shape, joint.dtype)
            x_t = add_noise(tables, joint, noise, t)
            pred = model.apply(
                params,
                (
                    flatten_face_edge(x_t[..., :12]),
                    flatten_face_edge(x_t[..., 12:]),
                    flatten_face_edge(batch["edgepos"]),
                    broadcast_face_to_edge(batch["surfpos"], ne),
                    broadcast_face_to_edge(surfz, ne),
                ),
                t,
                edge_mask.reshape(B, nf * ne),
                label,
            ).reshape(B, nf, ne, 18)
            tok_mse = jnp.mean(jnp.square(pred - noise), axis=-1)
            w = (~edge_mask).astype(jnp.float32)
            return jnp.sum(tok_mse * w), jnp.asarray(B, jnp.float32)
        raise ValueError(stage)

    return val
