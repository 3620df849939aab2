"""Training loop: AdamW(amsgrad), adaptive gradient clipping, data-parallel
sharding over a device mesh, orbax checkpointing.

Replaces the PyTorch-Lightning harness (lightning_modules.py:386-459,
train.py:137-161):

- AdamW with amsgrad and weight_decay=1e-12 (lightning_modules.py:187-189)
  via optax;
- the adaptive gradient clip — threshold = 1.5*mean + 2*std of the last 50
  accepted gradient norms (lightning_modules.py:936-961, utils.Queue:12-29)
  — is carried *in-graph* as a fixed-size circular buffer in the train
  state, so the whole update remains one jitted step;
- gradient accumulation via optax.MultiSteps (train.py:158);
- data parallelism: parameters replicated, batch sharded over the mesh's
  'data' axis; XLA inserts the gradient all-reduce.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from diffndm_tpu.config import TrainConfig
from diffndm_tpu.diffusion.core import CondDiffusion
from diffndm_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from diffndm_tpu.structs import NodeBatch
from diffndm_tpu.train.losses import assemble_loss, conditional_loss_terms

QUEUE_LEN = 50  # utils.Queue max_len (utils.py:13)


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray
    # adaptive-clip circular buffer of accepted grad norms
    gradnorm_buf: jnp.ndarray   # [QUEUE_LEN]
    gradnorm_count: jnp.ndarray  # how many entries are valid
    # EMA of params (equals params when cfg.ema_decay == 0)
    ema_params: Any = None


def make_optimizer(cfg: TrainConfig):
    """AdamW(amsgrad) with DECOUPLED weight decay: the decay is applied
    after the Adam preconditioner and scaled by the learning rate, matching
    torch.optim.AdamW(amsgrad=True) (lightning_modules.py:187-189).
    Chaining the decay before Adam would couple it through the
    preconditioner (plain L2), which is not what the reference runs."""
    scale = (optax.scale_by_amsgrad() if cfg.amsgrad
             else optax.scale_by_adam())
    steps = [scale]
    if cfg.weight_decay:
        steps.append(optax.add_decayed_weights(cfg.weight_decay))
    steps.append(optax.scale_by_learning_rate(cfg.lr))
    opt = optax.chain(*steps)
    if cfg.accumulate_grad_batches > 1:
        opt = optax.MultiSteps(opt, cfg.accumulate_grad_batches)
    return opt


class Trainer:
    def __init__(self, core: CondDiffusion, dynamics_module, params,
                 cfg: TrainConfig, lj_rm: Optional[np.ndarray] = None,
                 mesh=None, gamma_module=None):
        """gamma_module: when the diffusion core uses a LEARNED noise
        schedule (diffusion/learned_gamma.py), pass its GammaNetwork here
        and supply ``params`` as {"dynamics": ..., "gamma": ...}; both
        branches are then optimized by the VLB objective, as in the
        reference where GammaNetwork is part of the trained module
        (en_diffusion.py:37-38).  With a predefined schedule leave it None
        and pass the dynamics params directly."""
        self.core = core
        self.module = dynamics_module
        self.gamma_module = gamma_module
        if gamma_module is not None:
            assert isinstance(params, dict) and \
                set(params) >= {"dynamics", "gamma"}, \
                "learned-gamma training needs {'dynamics':..., 'gamma':...}"
        self.cfg = cfg
        self.lj_rm = None if lj_rm is None else jnp.asarray(lj_rm)
        self.tx = make_optimizer(cfg)
        self.mesh = mesh if mesh is not None else make_mesh()
        buf = jnp.full((QUEUE_LEN,), 3000.0)  # flush value, see :87-88
        state = TrainState(params=params, opt_state=self.tx.init(params),
                           step=jnp.zeros((), jnp.int32),
                           gradnorm_buf=buf,
                           gradnorm_count=jnp.ones((), jnp.int32),
                           ema_params=jax.tree.map(jnp.array, params))
        self.state = replicate(self.mesh, state)
        self._train_step = self._build_step(training=True)
        self._eval_step = self._build_step(training=False)

    # -----------------------------------------------------------------
    def _loss_fn(self, params, key, ligand: NodeBatch, pocket: NodeBatch,
                 training: bool):
        core = self.core
        if self.gamma_module is not None:
            # rebuild the schedule from the trained gamma branch so VLB
            # gradients flow into the GammaNetwork
            dyn_params = params["dynamics"]
            core = core._replace(schedule=core.schedule._replace(
                params=params["gamma"]))
        else:
            dyn_params = params

        def eps_fn(z_lig, xh_pocket, t, lm, pm):
            return self.module.apply(dyn_params, z_lig, xh_pocket, t, lm,
                                     pm)

        terms = conditional_loss_terms(key, core, eps_fn, ligand,
                                       pocket, training)
        nll, info = assemble_loss(terms, core, ligand, pocket,
                                  self.cfg, training, lj_rm=self.lj_rm)
        return jnp.mean(nll), info

    def _build_step(self, training: bool):
        cfg = self.cfg

        if not training:
            def eval_step(params, key, ligand: NodeBatch,
                          pocket: NodeBatch):
                return self._loss_fn(params, key, ligand, pocket, False)
            return jax.jit(eval_step)

        def step(state: TrainState, key, ligand: NodeBatch,
                 pocket: NodeBatch):

            (loss, info), grads = jax.value_and_grad(
                self._loss_fn, has_aux=True)(state.params, key, ligand,
                                             pocket, True)
            gnorm = optax.global_norm(grads)
            info["grad_norm"] = gnorm

            if cfg.clip_grad:
                cnt = jnp.maximum(state.gradnorm_count, 1)
                idx = jnp.arange(QUEUE_LEN) < cnt
                mean = jnp.sum(jnp.where(idx, state.gradnorm_buf, 0.0)) / cnt
                var = jnp.sum(jnp.where(
                    idx, (state.gradnorm_buf - mean) ** 2, 0.0)) / cnt
                max_norm = 1.5 * mean + 2.0 * jnp.sqrt(var)
                scale = jnp.minimum(1.0, max_norm / (gnorm + 1e-12))
                grads = jax.tree.map(lambda g: g * scale, grads)
                accepted = jnp.minimum(gnorm, max_norm)
                pos = state.step % QUEUE_LEN
                buf = state.gradnorm_buf.at[pos].set(accepted)
                count = jnp.minimum(state.gradnorm_count + 1, QUEUE_LEN)
                info["clip_threshold"] = max_norm
            else:
                buf, count = state.gradnorm_buf, state.gradnorm_count

            updates, opt_state = self.tx.update(grads, state.opt_state,
                                                state.params)
            params = optax.apply_updates(state.params, updates)
            if cfg.ema_decay > 0.0:
                d = cfg.ema_decay
                ema = jax.tree.map(lambda e, p: d * e + (1.0 - d) * p,
                                   state.ema_params, params)
            else:
                ema = params
            new_state = TrainState(params, opt_state, state.step + 1, buf,
                                   count, ema)
            return new_state, loss, info

        return jax.jit(step, donate_argnums=(0,))

    # -----------------------------------------------------------------
    def _pad_to_mesh(self, ligand: NodeBatch, pocket: NodeBatch):
        """Repeat-pad a batch whose size is not divisible by the data-mesh
        axis (the final partial batch of every epoch); repeated samples are
        slightly over-weighted in that step, which is the standard
        trade-off vs. dropping them."""
        n = int(np.prod([s for a, s in self.mesh.shape.items()
                         if a == "data"])) or 1
        b = ligand.x.shape[0]
        if b % n == 0:
            return ligand, pocket
        idx = np.concatenate([np.arange(b), np.arange((-b) % n) % b])
        pad = lambda nb: NodeBatch(x=nb.x[idx], h=nb.h[idx],
                                   mask=nb.mask[idx])
        return pad(ligand), pad(pocket)

    def train_step(self, key, ligand: NodeBatch, pocket: NodeBatch):
        ligand, pocket = self._pad_to_mesh(ligand, pocket)
        ligand = shard_batch(self.mesh, ligand)
        pocket = shard_batch(self.mesh, pocket)
        self.state, loss, info = self._train_step(self.state, key, ligand,
                                                  pocket)
        return float(loss), {k: float(v) for k, v in info.items()}

    def eval_step(self, key, ligand: NodeBatch, pocket: NodeBatch):
        ligand, pocket = self._pad_to_mesh(ligand, pocket)
        ligand = shard_batch(self.mesh, ligand)
        pocket = shard_batch(self.mesh, pocket)
        loss, info = self._eval_step(self.state.params, key, ligand, pocket)
        return float(loss), {k: float(v) for k, v in info.items()}

    # -- checkpointing (orbax) -----------------------------------------
    def save_checkpoint(self, path: str):
        import orbax.checkpoint as ocp

        path = os.path.abspath(path)
        ckptr = ocp.StandardCheckpointer()
        payload = {"params": self.state.params,
                   "step": self.state.step}
        if self.cfg.ema_decay > 0.0:
            payload["ema_params"] = self.state.ema_params
        ckptr.save(path, jax.device_get(payload), force=True)
        ckptr.wait_until_finished()

    def load_checkpoint(self, path: str):
        import orbax.checkpoint as ocp

        path = os.path.abspath(path)
        ckptr = ocp.StandardCheckpointer()
        target = jax.device_get({"params": self.state.params,
                                 "step": self.state.step})
        try:
            with_ema = dict(target,
                            ema_params=jax.device_get(
                                self.state.ema_params))
            restored = ckptr.restore(path, with_ema)
            ema = restored["ema_params"]
        except Exception:
            restored = ckptr.restore(path, target)
            ema = restored["params"]
        self.state = self.state._replace(
            params=replicate(self.mesh, restored["params"]),
            ema_params=replicate(self.mesh, ema),
            step=jnp.asarray(restored["step"]))
