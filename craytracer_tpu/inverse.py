"""Inverse-rendering driver: gradient-based recovery of scene parameters
through the differentiable wavefront tracer.

The reference renderer has no inverse mode — this implements the
BASELINE.json inverse-rendering configuration ("differentiable w.r.t.
material, texture, light, and camera") as a production API rather than a
test-only pattern. Design:

- The caller owns the parameterization: `params0` is any pytree and
  `apply_fn(scene, params) -> scene` grafts it into the scene (material
  rows, texture texels, light colors, camera vectors, ...). This keeps
  the driver agnostic to WHICH parameters are optimized and jit-friendly
  (apply_fn is a static closure).
- Each step renders one stratified spp slice (spp_index cycles over
  `spp_cycle`) so successive steps see different sample sets — stochastic
  gradient descent over the Monte-Carlo estimator.
- Checkpointing covers params + optimizer state + step counter + seed, so
  a resumed run continues bit-for-bit (same spp_index sequence, same
  optimizer moments) — the inverse-mode analog of the forward renderer's
  image-state resume (imagestate.h:5-43).
- `step()` reports loss and global grad norm (observability parity with
  the forward counters).
"""

from __future__ import annotations

import pickle
from dataclasses import dataclass
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax


@dataclass(frozen=True)
class InverseConfig:
    learning_rate: float = 0.05
    max_depth: int = 2
    estimator: str = "physical"
    spp_cycle: int = 4      # spp_index cycles 0..spp_cycle-1
    # Samples averaged per gradient step. MSE against a noisy render is
    # biased LOW: the estimator's variance grows with the parameters
    # (brighter albedo -> noisier render), so the optimizer trades bias
    # for variance and converges below the target. Averaging S samples
    # per step cuts the variance term (and thus the bias) by S.
    spp_per_step: int = 4
    optimizer: str = "adam"  # adam | sgd
    # cosine-decay the learning rate to ~0 over this many steps (0 = a
    # constant rate). Under Monte-Carlo gradient noise a constant-rate
    # Adam random-walks around the optimum with radius ~ lr * noise; the
    # decay anneals the walk (measured: metal roughness on the mesh demo
    # overshot 0.6 -> 0.12 past the 0.35 optimum at constant lr).
    decay_steps: int = 0
    # loss: "mse" (reference default) or "log1p" — MSE in log1p space.
    # Monte-Carlo renders of sharp glossy lobes are HEAVY-TAILED (most
    # samples miss the light, rare ones spike); the mean gradient points
    # toward the truth but the per-step gradient usually points the
    # other way, and Adam's sign-following random-walks downhill on the
    # typical step (measured: metal alpha converged to 0.12-0.16 under
    # plain MSE with the minimum verifiably at 0.35). log1p compresses
    # the spikes so the typical step agrees with the mean.
    loss: str = "mse"


def _make_optimizer(cfg: InverseConfig):
    lr = cfg.learning_rate
    if cfg.decay_steps:
        lr = optax.cosine_decay_schedule(cfg.learning_rate, cfg.decay_steps)
    if cfg.optimizer == "adam":
        return optax.adam(lr)
    if cfg.optimizer == "sgd":
        return optax.sgd(lr)
    raise ValueError(f"unknown optimizer {cfg.optimizer!r}")


class InverseRenderer:
    """Optimize `params` so the rendered image matches `target`.

    >>> inv = InverseRenderer(scene, cam, film, target, params0, apply_fn)
    >>> for _ in range(100):
    ...     loss, gnorm = inv.step()
    >>> inv.save_state("ckpt.pkl")          # later:
    >>> inv2 = InverseRenderer(...); inv2.load_state("ckpt.pkl")
    """

    def __init__(self, scene, cam, film, target, params0,
                 apply_fn: Callable, config: Optional[InverseConfig] = None,
                 seed: int = 7,
                 clip_fn: Optional[Callable] = None):
        from craytracer_tpu.integrator.wavefront import render_sample

        self.config = cfg = config or InverseConfig()
        self.params = params0
        self.opt = _make_optimizer(cfg)
        self.opt_state = self.opt.init(params0)
        self.step_idx = 0
        self.seed = seed
        self.nan_steps = 0  # skipped non-finite-gradient steps
        self.history: list = []  # (loss, grad_norm) per step
        self._clip_fn = clip_fn
        target = jnp.asarray(target)

        ids = jnp.arange(film.num_pixels, dtype=jnp.int32)

        def loss_fn(params, spp_index):
            s = apply_fn(scene, params)
            img = 0.0
            for k in range(cfg.spp_per_step):
                img = img + render_sample(
                    s, cam, film, ids, seed,
                    spp_index * cfg.spp_per_step + k,
                    cfg.max_depth, estimator=cfg.estimator)
            img = img / cfg.spp_per_step
            if cfg.loss == "log1p":
                return jnp.mean((jnp.log1p(img) - jnp.log1p(target)) ** 2)
            return jnp.mean((img - target) ** 2)

        self._value_and_grad = jax.jit(jax.value_and_grad(loss_fn))

    def step(self):
        """One optimization step; returns (loss, global_grad_norm).

        Non-finite gradients SKIP the update (counted in nan_steps) —
        the optimizer-side analog of the renderer's NaN recovery
        (main.cpp:127-136): one bad Monte-Carlo step must not poison
        the parameter state (Adam moments included)."""
        spp = jnp.int32(self.step_idx % self.config.spp_cycle)
        loss, g = self._value_and_grad(self.params, spp)
        gnorm = optax.global_norm(g)
        if not bool(jnp.isfinite(gnorm)) or not bool(jnp.isfinite(loss)):
            self.nan_steps += 1
            self.step_idx += 1
            rec = (float(loss), float(gnorm))
            self.history.append(rec)
            return rec
        updates, self.opt_state = self.opt.update(g, self.opt_state,
                                                  self.params)
        self.params = optax.apply_updates(self.params, updates)
        if self._clip_fn is not None:
            self.params = self._clip_fn(self.params)
        self.step_idx += 1
        rec = (float(loss), float(gnorm))
        self.history.append(rec)
        return rec

    def run(self, n_steps: int, log_every: int = 0):
        for i in range(n_steps):
            loss, gnorm = self.step()
            if log_every and (i % log_every == 0):
                print(f"step {self.step_idx:5d}  loss {loss:.6g}  "
                      f"|grad| {gnorm:.6g}")
        return self.params

    # -- checkpoint / resume ------------------------------------------------

    def save_state(self, path: str):
        """Persist params + optimizer state + step + seed (host numpy)."""
        host = jax.tree_util.tree_map(np.asarray,
                                      (self.params, self.opt_state))
        with open(path, "wb") as f:
            pickle.dump({"params": host[0], "opt_state": host[1],
                         "step_idx": self.step_idx, "seed": self.seed,
                         "history": self.history}, f)

    def load_state(self, path: str):
        with open(path, "rb") as f:
            st = pickle.load(f)
        if st["seed"] != self.seed:
            raise ValueError(
                f"checkpoint was created with seed {st['seed']}, renderer "
                f"uses {self.seed}: resuming would mix RNG streams")
        dev = jax.tree_util.tree_map(jnp.asarray,
                                     (st["params"], st["opt_state"]))
        self.params, self.opt_state = dev
        self.step_idx = st["step_idx"]
        self.history = list(st["history"])
        return self
