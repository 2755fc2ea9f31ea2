"""L4 training runtime — TPU-native re-design of reference
``v_diffusion/train_utils.py`` + EMA/checkpoint pieces of ``utils.py``.

Functional core, thin imperative shell:

* All mutable training state lives in one :class:`TrainState` pytree
  (params, opt_state, EMA params, step) threaded through a **single jitted
  ``train_step``** that contains: t/noise/label-dropout RNG, the diffusion
  loss, gradient accumulation as a ``lax.scan`` over micro-batches, global-norm
  clipping, the AdamW+warmup update, and the EMA update. Under a data-parallel
  mesh the batch is sharded on the 'data' axis and params are replicated, so
  XLA inserts the gradient all-reduce over ICI automatically (replacing DDP's
  bucket all-reduce, train.py:148). With ``fsdp=True`` the whole TrainState is
  instead STORED sharded (ZeRO-3; see parallel/fsdp.py and PARALLEL.md) — the
  same step function, different in/out shardings.
* EMA (reference utils.py:123-190) is a pure pytree update with the warmup
  decay rule min(decay, (1+n)/(10+n)); no weakrefs/param-swapping — sampling
  simply closes over ``state.ema_params``.
* RNG: a single base seed; the per-step key is ``fold_in(train_key, step)`` and
  per-host streams fold in ``process_index`` — replacing the 8191+rank /
  127+rank / 131071+rank torch generators (train_utils.py:124-126). Resume
  restores determinism from (seed, step) alone, so checkpoints need no RNG
  state blobs.
* Checkpointing via Orbax: params/opt_state/EMA/step + epoch, with
  ``max_ckpts_kept`` retention and ``ckpt_{epoch}`` / ``ckpt_last`` naming
  (reference train_utils.py:277-352).
"""

from __future__ import annotations

import math
import os
import shutil
from functools import partial
from typing import Any, Optional

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from .parallel import (
    batch_sharding,
    create_mesh,
    replicated,
    sync_global_devices,
)
from .utils.misc import RunningStatistics, save_image


class TrainState(flax.struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    ema_params: Any  # None when EMA disabled


def make_optimizer(lr, beta1=0.9, beta2=0.999, weight_decay=0.0, warmup=0, grad_norm=1.0):
    """AdamW + linear warmup + global-norm clipping (reference train.py:158-162,
    train_utils.py:161)."""
    if warmup and warmup > 0:
        schedule = lambda t: lr * jnp.minimum((t + 1.0) / warmup, 1.0)
    else:
        schedule = lr
    tx = []
    if grad_norm and grad_norm > 0:
        tx.append(optax.clip_by_global_norm(grad_norm))
    tx.append(optax.adamw(schedule, b1=beta1, b2=beta2, weight_decay=weight_decay))
    return optax.chain(*tx)


def ema_update(ema_params, params, num_updates, decay):
    """shadow += (1-d)(p-shadow), d = min(decay, (1+n)/(10+n)) (utils.py:144-149)."""
    d = jnp.minimum(decay, (1.0 + num_updates) / (10.0 + num_updates))
    return jax.tree.map(lambda e, p: e + (1.0 - d) * (p - e), ema_params, params)


def make_train_step(
    model,
    diffusion,
    optimizer,
    timesteps: int,
    num_accum: int = 1,
    use_cfg: bool = False,
    ema_decay: float = 0.9999,
    use_ema: bool = False,
):
    """Build the jitted train step: (state, x, y, rng) -> (state, loss).

    Matches reference Trainer.loss/step semantics (train_utils.py:137-169):
    discrete t ~ (randint(T)+1)/T or continuous t ~ U(0,1); per-sample loss
    meaned; grad-accum averages micro-grads; clip → AdamW → EMA.
    """

    def micro_loss(params, x, y, rng):
        B = x.shape[0]
        t_rng, noise_rng, uncond_rng, drop_rng = jax.random.split(rng, 4)
        if timesteps > 0:
            t = (jax.random.randint(t_rng, (B,), 0, timesteps) + 1.0) / timesteps
        else:
            t = jax.random.uniform(t_rng, (B,))
        noise = jax.random.normal(noise_rng, x.shape, x.dtype)

        def denoise_fn(x_t, t_, y_):
            return model.apply(
                {"params": params}, x_t, t_, y_, train=True, rngs={"dropout": drop_rng}
            )

        loss = diffusion.train_loss(
            denoise_fn, x_0=x, t=t, y=y if use_cfg else None, noise=noise,
            uncond_rng=uncond_rng if use_cfg else None,
        )
        return loss.mean()

    def train_step(state, x, y, rng):
        if num_accum == 1:
            loss, grads = jax.value_and_grad(micro_loss)(state.params, x, y, rng)
        else:
            mb = x.shape[0] // num_accum
            xs = x[: mb * num_accum].reshape(num_accum, mb, *x.shape[1:])
            ys = (
                y[: mb * num_accum].reshape(num_accum, mb, *y.shape[1:])
                if y is not None
                else None
            )
            keys = jax.random.split(rng, num_accum)

            def body(carry, inp):
                loss_acc, grad_acc = carry
                xi, ki = inp[0], inp[-1]
                yi = inp[1] if y is not None else None
                li, gi = jax.value_and_grad(micro_loss)(state.params, xi, yi, ki)
                grad_acc = jax.tree.map(lambda a, b: a + b / num_accum, grad_acc, gi)
                return (loss_acc + li / num_accum, grad_acc), None

            zero_grads = jax.tree.map(jnp.zeros_like, state.params)
            inputs = (xs, ys, keys) if y is not None else (xs, keys)
            (loss, grads), _ = jax.lax.scan(body, (0.0, zero_grads), inputs)

        updates, new_opt_state = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_step = state.step + 1
        new_ema = state.ema_params
        if use_ema and state.ema_params is not None:
            new_ema = ema_update(state.ema_params, new_params, new_step, ema_decay)
        return (
            state.replace(step=new_step, params=new_params, opt_state=new_opt_state, ema_params=new_ema),
            loss,
        )

    return train_step


# ---------------------------------------------------------------------------
# checkpointing (Orbax)
# ---------------------------------------------------------------------------


class CheckpointManager:
    """Single-directory-per-epoch Orbax checkpoints with reference naming and
    retention semantics (train_utils.py:328-348): ``ckpt_{epoch}``, final epoch
    → ``ckpt_last``, oldest-deleted when over ``max_ckpts_kept``."""

    def __init__(self, ckpt_dir: str, max_ckpts_kept: int = -1):
        import orbax.checkpoint as ocp

        self.ckpt_dir = os.path.abspath(ckpt_dir)
        self.max_ckpts_kept = max_ckpts_kept
        self._ckptr = ocp.StandardCheckpointer()

    def _path(self, tag) -> str:
        return os.path.join(self.ckpt_dir, f"ckpt_{tag}")

    def save(self, state: TrainState, epoch: int, epochs: int, extra: Optional[dict] = None):
        """COLLECTIVE under multi-host: Orbax's checkpointer runs internal
        cross-process barriers, so EVERY process must call save together (it
        coordinates so only the primary host writes); the extra filesystem
        mutations here (rmtree of a stale dir, extra_info.json, retention) are
        leader-only, fenced by barriers."""
        is_leader = jax.process_index() == 0
        os.makedirs(self.ckpt_dir, exist_ok=True)
        tag = "last" if epoch == epochs else epoch
        payload = {
            "step": state.step,
            "params": state.params,
            "opt_state": state.opt_state,
            "epoch": np.asarray(epoch, dtype=np.int64),
        }
        if state.ema_params is not None:
            payload["ema_params"] = state.ema_params
        path = self._path(tag)
        if is_leader and os.path.exists(path):
            shutil.rmtree(path)
        sync_global_devices("ckpt_dir_cleared")
        self._ckptr.save(path, payload)
        self._ckptr.wait_until_finished()
        if extra is not None and is_leader:
            import json

            with open(os.path.join(path, "extra_info.json"), "w") as f:
                json.dump({k: _jsonable(v) for k, v in extra.items()}, f)
        if is_leader:
            self._retain()
        sync_global_devices("ckpt_saved")
        return path

    def _retain(self):
        if self.max_ckpts_kept == -1:
            return
        ckpts = [
            os.path.join(self.ckpt_dir, d)
            for d in os.listdir(self.ckpt_dir)
            if d.startswith("ckpt_")
        ]
        while len(ckpts) > self.max_ckpts_kept:
            oldest = min(ckpts, key=os.path.getctime)
            shutil.rmtree(oldest)
            ckpts.remove(oldest)

    def latest_path(self) -> Optional[str]:
        if not os.path.isdir(self.ckpt_dir):
            return None
        # only integer tags + last/latest are checkpoints; anything else
        # (e.g. an interrupted save's ckpt_3.orbax-checkpoint-tmp-<ts>)
        # must be skipped, not int()-crashed on
        cands = [
            d for d in os.listdir(self.ckpt_dir)
            if d.startswith("ckpt_")
            and (d.split("_", 1)[1].isdigit() or d.split("_", 1)[1] in ("last", "latest"))
        ]
        if not cands:
            return None

        def key(d):
            tag = d.split("_", 1)[1]
            return (1, 0) if tag in ("last", "latest") else (0, int(tag))

        return os.path.join(self.ckpt_dir, max(cands, key=key))

    def restore(self, state: TrainState, path: Optional[str] = None):
        path = path or self.latest_path()
        if path is None or not os.path.exists(path):
            raise FileNotFoundError(path or self.ckpt_dir)
        target = {
            "step": state.step,
            "params": state.params,
            "opt_state": state.opt_state,
            "epoch": np.asarray(0, dtype=np.int64),
        }
        if state.ema_params is not None:
            target["ema_params"] = state.ema_params
        restored = self._ckptr.restore(path, target)
        new_state = state.replace(
            step=restored["step"],
            params=restored["params"],
            opt_state=restored["opt_state"],
            ema_params=restored.get("ema_params", state.ema_params),
        )
        return new_state, int(restored["epoch"])


def _jsonable(v):
    if isinstance(v, (np.generic, jnp.ndarray)):
        return float(np.asarray(v))
    return v


# ---------------------------------------------------------------------------
# Trainer shell
# ---------------------------------------------------------------------------


class Trainer:
    """Epoch-loop orchestration (reference Trainer, train_utils.py:62-352).

    The hot path is one jitted call per macro-batch; cadence logic
    (eval/image/ckpt intervals), stats, and sample-grid IO run host-side.
    """

    def __init__(
        self,
        model,
        diffusion,
        timesteps: int,
        epochs: int,
        trainloader,
        optimizer_config: Optional[dict] = None,
        sampler=None,
        use_cfg: bool = False,
        use_ema: bool = False,
        grad_norm: float = 1.0,
        num_accum: int = 1,
        shape=None,
        ckpt_intv: int = 512,
        max_ckpts_kept: int = -1,
        image_intv: int = 64,
        eval_intv: int = 128,
        num_save_images: int = 64,
        ema_decay: float = 0.9999,
        seed: int = 1234,
        mesh=None,
        sample_use_flash: bool = True,
        dtype=None,
        fsdp: bool = False,
        fsdp_size: int = 0,
    ):
        self.model = model
        self.diffusion = diffusion
        self.timesteps = timesteps
        self.epochs = epochs
        self.start_epoch = 0
        self.trainloader = trainloader
        self.sampler = sampler if sampler is not None else trainloader
        self.use_cfg = use_cfg
        self.use_ema = use_ema
        self.num_accum = num_accum
        self.shape = shape  # (H, W, C)
        self.ckpt_intv = ckpt_intv
        self.max_ckpts_kept = max_ckpts_kept
        self.image_intv = image_intv
        self.eval_intv = eval_intv
        self.num_save_images = num_save_images
        self.seed = seed

        # fsdp_size > 1 builds a hybrid (data, fsdp) mesh: batch over all
        # devices, state sharded only within size-fsdp_size ICI neighborhoods
        self.fsdp = bool(fsdp) or fsdp_size > 1
        if mesh is None:
            mesh = create_mesh(fsdp_size=fsdp_size if self.fsdp else 1)
        self.mesh = mesh
        self.is_leader = jax.process_index() == 0
        self.world_size = jax.process_count()

        # --- RNG streams (replaces train_utils.py:124-126 generator scheme) ---
        root = jax.random.key(seed)
        self.init_key = jax.random.fold_in(root, 0)
        self.train_key = jax.random.fold_in(root, 1)
        self.sample_key = jax.random.fold_in(root, 2)
        self.label_key = jax.random.fold_in(root, 3)

        # --- init params + optimizer + state ---
        opt_cfg = dict(lr=2e-4, beta1=0.9, beta2=0.999, weight_decay=0.0, warmup=0)
        opt_cfg.update(optimizer_config or {})
        opt_cfg["grad_norm"] = grad_norm
        self.optimizer = make_optimizer(**opt_cfg)

        H, W, C = self.shape
        dummy_x = jnp.zeros((1, H, W, C), jnp.float32)
        dummy_t = jnp.zeros((1,), jnp.float32)
        dummy_y = self._dummy_label(1)
        variables = model.init(
            {"params": self.init_key, "dropout": self.init_key}, dummy_x, dummy_t, dummy_y
        )
        params = variables["params"]
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=self.optimizer.init(params),
            # distinct buffers: aliasing params breaks jit donation
            ema_params=jax.tree.map(jnp.copy, params) if use_ema else None,
        )
        # state placement: replicated (DDP semantics) or FSDP-sharded over the
        # same 'data' axis (ZeRO-3 — params/moments/EMA at 1/N memory per chip,
        # jit inserts the use-site all-gathers + grad reduce-scatter)
        if self.fsdp:
            from .parallel.fsdp import state_shardings

            self._state_shardings = state_shardings(self.mesh, state)
        else:
            self._state_shardings = replicated(self.mesh)
        self.state = jax.device_put(state, self._state_shardings)

        train_step = make_train_step(
            model,
            diffusion,
            self.optimizer,
            timesteps=timesteps,
            num_accum=num_accum,
            use_cfg=use_cfg,
            ema_decay=ema_decay,
            use_ema=use_ema,
        )
        rep = replicated(self.mesh)
        self._train_step = jax.jit(
            train_step,
            in_shardings=(self._state_shardings, batch_sharding(self.mesh, 4), None, None),
            out_shardings=(self._state_shardings, rep),
            donate_argnums=(0,),
        )
        self._sample_jit = {}

        self.stats = RunningStatistics(loss=None)
        self.ckpt_manager: Optional[CheckpointManager] = None
        self._host_step = 0  # mirrors state.step without device syncs
        self._pending_losses = []

    # ------------------------------------------------------------------

    @property
    def num_classes(self):
        return self.model.num_classes

    @property
    def multitags(self):
        return self.model.multitags

    def _dummy_label(self, b):
        if self.model.num_classes == 0:
            return None
        if self.model.multitags:
            return jnp.zeros((b, self.model.num_classes), jnp.float32)
        return jnp.zeros((b,), jnp.float32)

    def _put_batch(self, x, y):
        from .parallel import shard_batch

        x = shard_batch(self.mesh, x)
        if y is not None:
            y = shard_batch(self.mesh, y)
        return x, y

    def step(self, x, y, epoch_stats=True):
        """One macro-batch. The step index for RNG folding is tracked host-side
        (a device_get of state.step would force a host-device sync per batch —
        ~33 ms RPC on tunneled TPUs — serializing the pipeline); the loss is
        recorded as a device scalar and only synced when stats are read."""
        B = x.shape[0]
        rng = jax.random.fold_in(self.train_key, self._host_step)
        self._host_step += 1
        x, y = self._put_batch(x, y)
        self.state, loss = self._train_step(self.state, x, y, rng)
        if epoch_stats:
            self._pending_losses.append((B, loss))
        return loss

    def _flush_stats(self):
        if self._pending_losses:
            pending, self._pending_losses = self._pending_losses, []
            for B, loss in pending:
                self.stats.update(B, loss=float(jax.device_get(loss)) * B)

    # ------------------------------------------------------------------
    # sampling
    # ------------------------------------------------------------------

    def _sampling_params(self):
        return self.state.ema_params if (self.use_ema and self.state.ema_params is not None) else self.state.params

    def sample_fn(self, label=None, batch_size=None, use_ddim=False, diffusion=None, seed_key=None):
        """Sample a batch under EMA weights; jitted & cached per shape config.

        The batch is sharded over the data axis with ``shard_map`` — the
        compiled analogue of the reference's per-rank sampling + all_gather
        (train_utils.py:171-185); per-shard noise derives from
        fold_in(rng, axis_index). The gathered result is fully replicated so
        ``device_get`` is valid on every process under multi-host. Batches that
        don't divide the mesh are padded up and sliced back on the host.

        COLLECTIVE: under multi-host every process must call this together.
        """
        diffusion = diffusion or self.diffusion
        B = batch_size or self.num_save_images
        H, W, C = self.shape
        has_label = label is not None
        n_dev = self.mesh.devices.size
        Bp = -(-B // n_dev) * n_dev  # padded batch (== B when divisible)
        shard = n_dev > 1
        # frozen-dataclass key: hashable, and holding it in the dict keeps the
        # object alive — no id-reuse staleness across GC
        cache_key = (Bp, use_ddim, has_label, shard, diffusion)
        if cache_key not in self._sample_jit:

            def denoise(params, x_t, t_, y_):
                return self.model.apply({"params": params}, x_t, t_, y_, train=False)

            if shard and self.fsdp:
                # params stay FSDP-sharded INTO the sampling jit — GSPMD
                # inserts the per-layer all-gathers at each weight's use site
                # instead of materializing the full EMA tree on every device
                # up front (shard_map in_specs=P() did exactly that,
                # reintroducing the per-chip memory FSDP exists to avoid).
                # The batch is GSPMD-sharded over the mesh; the output is
                # forced replicated so device_get works on every process.
                p_sh = (
                    self._state_shardings.ema_params
                    if (self.use_ema and self.state.ema_params is not None)
                    else self._state_shardings.params
                )
                y_sh = (
                    batch_sharding(self.mesh, label.ndim) if has_label else None
                )

                x_sh = batch_sharding(self.mesh, 4)

                def fsdp_sample(params, rng, y):
                    def denoise_anchored(x_t, t_, y_):
                        # anchor the batch dim every step: with only the
                        # params sharded (feature dims) and the output
                        # replicated, GSPMD has no data-parallel anchor for
                        # the label-free case and may replicate the whole
                        # batch computation on every device
                        x_t = jax.lax.with_sharding_constraint(x_t, x_sh)
                        return denoise(params, x_t, t_, y_)

                    return diffusion.p_sample(
                        denoise_anchored, (Bp, H, W, C), rng,
                        label=y if has_label else None, use_ddim=use_ddim,
                    )

                self._sample_jit[cache_key] = jax.jit(
                    fsdp_sample,
                    in_shardings=(p_sh, None, y_sh),
                    out_shardings=replicated(self.mesh),
                )
            elif shard:
                from jax.sharding import PartitionSpec as P

                # the batch splits over EVERY mesh axis (under a hybrid
                # (data, fsdp) mesh both axes are data-parallel for sampling)
                axes = tuple(self.mesh.axis_names)
                y_spec = P(axes) if has_label else P()

                def shard_fn(params, rng, y):
                    # linearized device index, major-to-minor in mesh axis
                    # order — matches the P(axes) batch linearization
                    idx = jnp.int32(0)
                    for a in axes:
                        idx = idx * self.mesh.shape[a] + jax.lax.axis_index(a)
                    r = jax.random.fold_in(rng, idx)
                    x = diffusion.p_sample(
                        partial(denoise, params), (Bp // n_dev, H, W, C), r,
                        label=y if has_label else None, use_ddim=use_ddim,
                    )
                    # replicate the result so every process can read the full
                    # batch (a P(axes) output is not addressable cross-host)
                    return jax.lax.all_gather(x, axes, axis=0, tiled=True)

                # check_vma=False: the tiled all_gather output IS replicated,
                # but shard_map's static replication checker can't infer it
                fn = jax.shard_map(
                    shard_fn, mesh=self.mesh,
                    in_specs=(P(), P(), y_spec), out_specs=P(),
                    check_vma=False,
                )
                self._sample_jit[cache_key] = jax.jit(fn)
            else:

                def _sample(params, rng, y):
                    return diffusion.p_sample(
                        partial(denoise, params), (Bp, H, W, C), rng,
                        label=y if has_label else None, use_ddim=use_ddim,
                    )

                self._sample_jit[cache_key] = jax.jit(_sample)
        rng = seed_key if seed_key is not None else self.sample_key
        if has_label:
            y_arg = label
            if Bp != B:
                # pad rank-preserving: multitag labels are (B, K), not (B,)
                pad = jnp.zeros((Bp - B,) + label.shape[1:], label.dtype)
                y_arg = jnp.concatenate([label, pad])
        else:
            y_arg = jnp.zeros((Bp,), jnp.float32)
        out = self._sample_jit[cache_key](self._sampling_params(), rng, y_arg)
        return jax.device_get(out)[:B]

    def eval_labels(self, b, key):
        """Random conditional labels for in-training FID, mirroring the
        offline generate path (reference generate.py:118-136): scalar classes
        uniform in [1, K]; multitags drawn from dataset target rows. The key
        derives from the shared seed, so every process draws the SAME labels
        (they feed the collective sample_fn)."""
        if self.multitags:
            ds = self.trainloader.dataset
            idx = jax.random.randint(key, (b,), 0, len(ds))
            return jnp.asarray(np.asarray(ds.targets)[np.asarray(idx)], jnp.float32)
        return jax.random.randint(key, (b,), 1, self.num_classes + 1).astype(jnp.float32)

    def sample_labels(self):
        """Balanced class grid / dataset-drawn tag rows (train_utils.py:187-203)."""
        n = self.num_save_images
        if self.multitags:
            ds = self.trainloader.dataset
            idx = jax.random.randint(self.label_key, (n,), 0, len(ds))
            targets = np.asarray(ds.targets)
            return jnp.asarray(targets[np.asarray(idx)], jnp.float32)
        K = self.num_classes
        labels = np.arange(K, dtype=np.float32) + 1
        repeats = np.asarray([n // K + int(i < n % K) for i in range(K)])
        return jnp.asarray(np.repeat(labels, repeats))

    # ------------------------------------------------------------------
    # main loop
    # ------------------------------------------------------------------

    def train(self, evaluator=None, ckpt_dir=None, image_dir=None, use_ddim=False, logger=print):
        from tqdm import tqdm

        if ckpt_dir and self.ckpt_manager is None:
            self.ckpt_manager = CheckpointManager(ckpt_dir, self.max_ckpts_kept)

        nrow = 8
        labels = None
        if self.num_save_images:
            if self.num_classes:
                labels = self.sample_labels()
                nrow = math.ceil(self.num_save_images / self.num_classes)
            else:
                nrow = math.floor(math.sqrt(self.num_save_images))

        for e in range(self.start_epoch, self.epochs):
            self.stats.reset()
            self.trainloader.set_epoch(e)
            results = {}
            with tqdm(
                self.trainloader,
                desc=f"{e + 1}/{self.epochs} epochs",
                disable=not self.is_leader,
                total=len(self.trainloader),
            ) as it:
                for i, (x, y) in enumerate(it):
                    # y dropped when CFG is off (reference train_utils.py:251-252)
                    self.step(x, y if self.use_cfg else None)
                    if i % 16 == 15 or i + 1 == len(self.trainloader):
                        # throttled: reading stats syncs pending device losses
                        it.set_postfix(self.current_stats)

                if evaluator is not None and not (e + 1) % self.eval_intv:
                    # sample_fn is collective (shard_map over the global mesh):
                    # ALL processes must run the eval; only reporting is
                    # leader-gated. (The reference's leader-only all_gather is
                    # the analogous multi-host hang — not replicated here.)
                    # CFG models sample CONDITIONALLY — the headline FID is
                    # class-conditional (reference generate.py:118-136; its own
                    # Evaluator passes an int as labels, train_utils.py:375 —
                    # intent implemented per SURVEY §3.5). Labels fold
                    # (epoch, eval-batch) so draws differ per batch but are
                    # identical across processes.
                    eval_draws = iter(range(1 << 30))

                    def eval_sample(b, d=None, _e=e):
                        y = None
                        if self.use_cfg and self.num_classes:
                            k = jax.random.fold_in(
                                jax.random.fold_in(self.label_key, 1 + _e),
                                next(eval_draws),
                            )
                            y = self.eval_labels(b, k)
                        return self.sample_fn(
                            label=y, batch_size=b, use_ddim=use_ddim, diffusion=d
                        )

                    eval_results = evaluator.eval(eval_sample)
                    if self.is_leader:
                        results.update(self.current_stats)
                        results.update(eval_results)
                        it.set_postfix(results)

            if ((e + 1) == self.epochs or not (e + 1) % self.image_intv) and self.num_save_images and image_dir:
                x = self.sample_fn(
                    label=labels, use_ddim=use_ddim,
                    seed_key=jax.random.fold_in(self.sample_key, e),
                )
                if self.is_leader:
                    save_image(x, os.path.join(image_dir, f"{e + 1}.png"), nrow=nrow)
            if ((e + 1) == self.epochs or not (e + 1) % self.ckpt_intv) and self.max_ckpts_kept and self.ckpt_manager:
                extra = results.copy() or dict(self.current_stats)
                # collective: every process joins the Orbax save (the manager
                # leader-gates the actual writes)
                self.save_checkpoint(epoch=e + 1, extra=extra)
            sync_global_devices(f"epoch_{e}")

    @property
    def current_stats(self):
        self._flush_stats()
        return {k: round(v, 6) for k, v in self.stats.extract().items()}

    # ------------------------------------------------------------------
    # checkpointing
    # ------------------------------------------------------------------

    def save_checkpoint(self, epoch: int, extra=None):
        assert self.ckpt_manager is not None
        # FSDP state is not fully addressable per host under multi-process —
        # hand Orbax the sharded global arrays (it saves collectively) instead
        # of a device_get'd host copy
        host_state = self.state if self.fsdp else jax.device_get(self.state)
        return self.ckpt_manager.save(host_state, epoch, self.epochs, extra=extra)

    def load_checkpoint(self, ckpt_path=None, ckpt_dir=None):
        if self.ckpt_manager is None:
            assert ckpt_dir is not None
            self.ckpt_manager = CheckpointManager(ckpt_dir, self.max_ckpts_kept)
        # under FSDP restore against the live sharded arrays so each shard loads
        # straight to its device (no host round-trip)
        target = self.state if self.fsdp else jax.device_get(self.state)
        new_state, epoch = self.ckpt_manager.restore(target, ckpt_path)
        self.state = jax.device_put(new_state, self._state_shardings)
        self.start_epoch = epoch
        # restore the host-side step mirror so RNG folding stays deterministic
        # across resume (determinism derives from (seed, step))
        self._host_step = int(np.asarray(new_state.step))


class Evaluator:
    """In-training FID evaluation (reference train_utils.py:355-378), with the
    clean signature the reference intended: sample_fn(batch_size) -> images."""

    def __init__(self, dataset: str, diffusion=None, eval_batch_size=256, max_eval_count=10000,
                 precomputed_dir="precomputed", feature_fn=None, target_stats=None,
                 mesh=None):
        from .metrics.fid import InceptionStatistics, get_precomputed, calc_fd

        self.diffusion = diffusion
        dim = len(target_stats[0]) if target_stats is not None else 2048
        # the training mesh: Inception batches shard over the same devices the
        # sampler just used. Every host sees the full gathered sample batch,
        # so multi-process drops to this host's addressable devices (the
        # metric pass is replicated across hosts either way).
        if mesh is not None:
            import jax

            if jax.process_count() > 1:
                from .parallel import create_mesh

                mesh = create_mesh(jax.local_devices())
        self.istats = InceptionStatistics(feature_fn=feature_fn, activation_dim=dim,
                                          mesh=mesh)
        self.eval_batch_size = eval_batch_size
        self.max_eval_count = max_eval_count
        # missing local stats must not kill training before the first step —
        # mirror eval.py's graceful per-metric skip instead of raising here
        self._skip_reason = None
        if target_stats is not None:
            self.target_mean, self.target_var = target_stats
        else:
            try:
                self.target_mean, self.target_var = get_precomputed(dataset, download_dir=precomputed_dir)
            except FileNotFoundError as e:
                self.target_mean = self.target_var = None
                self._skip_reason = str(e)
        self._calc_fd = calc_fd

    def eval(self, sample_fn, logger=print):
        if self._skip_reason is not None:
            logger(f"FID skipped: {self._skip_reason}")
            return {}
        self.istats.reset()
        try:
            for _ in range(0, self.max_eval_count + self.eval_batch_size, self.eval_batch_size):
                x = sample_fn(self.eval_batch_size, self.diffusion)
                self.istats.update(np.asarray(x))
        except FileNotFoundError as e:  # lazy Inception weights absent on this box
            self._skip_reason = str(e)
            logger(f"FID skipped: {self._skip_reason}")
            return {}
        gen_mean, gen_var = self.istats.get_statistics()
        return {"fid": self._calc_fd(gen_mean, gen_var, self.target_mean, self.target_var)}
