"""Embedded realtime API — the reference ``run_drag.RunDrag`` surface.

Consumed by the native C-ABI layer and the socket server.  Method-for-method
parity with ``python/src/run_drag.py`` (same names, shapes and conventions):

* ``set_reference_skeleton(bvh_path) -> n_joints``
* ``load_models(model_dir)``
* ``set_mask_and_weights(mask (J,), weights (J,2)) -> n_end_effectors``
* ``init_drag_pose(initial_global_pos (1,3), initial_global_rot (1,4))``
* ``set_optim_params(stop_eps_pos, stop_eps_rot, max_iter, lr)``
* ``set_lambdas(lambda_rot, lambda_temporal, temporal_future_window)``
* ``set_global_pos(global_pos (1,3))``
* ``drag_pose(target_ee_pos (E,3), target_ee_rot (E,4), out_pose (J,4),
  out_global_pos (1,3))`` — writes parent-local wxyz quaternions.

Unlike the reference (which interprets PyTorch per frame), ``drag_pose`` is
one dispatch of a pre-compiled device computation.  The dense end-effector
mask means runtime mask edits never recompile; only optimizer/lambda changes
rebuild the compiled step (lazily).
"""

from __future__ import annotations

import os
import time
from typing import Optional

import numpy as np

from dragposer_tpu import config as cfg
from dragposer_tpu.data import encoding
from dragposer_tpu.io.bvh import BVH
from dragposer_tpu.models import loading, vae
from dragposer_tpu.ops.topology import Skeleton


def _enable_compilation_cache():
    """Persistent XLA cache — the embedded client must not pay a multi-second
    compile inside the first ``drag_pose`` on every process start.

    The directory is keyed by environment: the axon sitecustomize hook
    builds CPU executables with different target-machine features than a
    scrubbed environment, and XLA loads a mismatched AOT entry without
    complaint (observed: garbage poses) — same hazard tests/conftest.py
    documents."""
    import jax

    tag = "axoncpu" if os.environ.get("PALLAS_AXON_POOL_IPS") else "cpu"
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("DRAGPOSER_JAX_CACHE",
                           f"/tmp/dragposer_jax_cache_{tag}"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # already configured by the host application


class RealtimeSession:
    def __init__(self, log_path: Optional[str] = "log_python.txt"):
        _enable_compilation_cache()
        self._log_path = log_path
        self.skeleton: Optional[Skeleton] = None
        self._engine = None
        self._engine_dirty = True
        self._state = None
        # realtime defaults (reference DragPoserDLL/main.cpp:28-29)
        self.stop_eps_pos = 1e-4
        self.stop_eps_rot = 0.01
        self.max_iter = 10
        self.learning_rate = 0.01
        self.lambda_rot = 1.0
        self.lambda_temporal = 0.02
        self.temporal_future_window = 60

    # ------------------------------------------------------------------
    def log(self, msg: str) -> None:
        if self._log_path:
            with open(self._log_path, "a") as f:
                f.write(f"[{time.strftime('%H:%M:%S')}] {msg}\n")

    # ------------------------------------------------------------------
    def set_reference_skeleton(self, bvh_path: str) -> int:
        bvh = BVH().load(bvh_path)
        _, _, parents, offsets, _ = encoding.info_from_bvh(bvh)
        self.skeleton = Skeleton.build(parents, offsets, bvh.names)
        self._skeleton_path = os.path.abspath(bvh_path)
        self._engine_dirty = True
        self.log(f"skeleton: {self.skeleton.n_joints} joints from {bvh_path}")
        return self.skeleton.n_joints

    def config_key(self):
        """Engine-configuration fingerprint: two sessions with equal keys run
        numerically identical compiled steps and can be coalesced into one
        batched frame program by the serving daemon (masks/weights are per-
        avatar DATA and deliberately not part of the key)."""
        return (getattr(self, "_skeleton_path", None),
                getattr(self, "_model_dir", None),
                self.stop_eps_pos, self.stop_eps_rot, self.max_iter,
                self.learning_rate, self.lambda_rot, self.lambda_temporal,
                self.temporal_future_window)

    def load_models(self, model_dir: str) -> None:
        assert self.skeleton is not None, "call set_reference_skeleton first"
        self._model_dir = os.path.abspath(model_dir)
        self._params, self._means, self._stds = loading.load_generator(
            model_dir, self.skeleton.parents, cfg.VAE_PARAM
        )
        temporal = loading.load_temporal(model_dir, cfg.TEMPORAL_PARAM)
        if temporal is None:
            self._temporal = None
            self._means_latent = np.zeros(cfg.VAE_PARAM["latent_dim"], np.float32)
            self._stds_latent = np.ones(cfg.VAE_PARAM["latent_dim"], np.float32)
        else:
            self._temporal, self._means_latent, self._stds_latent = temporal
        self._statics = vae.build_statics(self.skeleton.parents, cfg.VAE_PARAM)
        self._engine_dirty = True
        self.log(f"models loaded from {model_dir} "
                 f"(temporal={'yes' if self._temporal is not None else 'no'})")

    def set_mask_and_weights(self, mask: np.ndarray, weights: np.ndarray) -> int:
        j = self.skeleton.n_joints
        mask = np.asarray(mask, np.float32).reshape(j)
        weights = np.asarray(weights, np.float32).reshape(j, 2)
        self._mask = mask
        self._weights = weights
        self._mask_indices = np.nonzero(mask)[0]
        # mask/weights are data — live update without recompiling (other
        # leaves stay device-resident; only the two small arrays upload)
        if self._engine is not None and not self._engine_dirty:
            import jax

            self._engine.model = self._engine.model._replace(
                mask=jax.device_put(mask), weights=jax.device_put(weights)
            )
        return int(len(self._mask_indices))

    def set_optim_params(self, stop_eps_pos: float, stop_eps_rot: float,
                         max_iter: int, lr: float) -> None:
        # Clients (reference DragPoser.cs:150-173) push params EVERY frame;
        # only an actual change may invalidate the compiled engine.
        new = (float(stop_eps_pos), float(stop_eps_rot), int(max_iter),
               float(lr))
        old = (self.stop_eps_pos, self.stop_eps_rot, self.max_iter,
               self.learning_rate)
        (self.stop_eps_pos, self.stop_eps_rot, self.max_iter,
         self.learning_rate) = new
        if new != old:
            self._engine_dirty = True

    def set_lambdas(self, lambda_rot: float, lambda_temporal: float,
                    temporal_future_window: int) -> None:
        new = (float(lambda_rot), float(lambda_temporal),
               int(temporal_future_window))
        old = (self.lambda_rot, self.lambda_temporal,
               self.temporal_future_window)
        self.lambda_rot, self.lambda_temporal, self.temporal_future_window = new
        if new != old:
            self._engine_dirty = True

    # ------------------------------------------------------------------
    def _build_engine(self):
        from dragposer_tpu.drag.engine import DragEngine, DragHyper, DragModel

        model = DragModel(
            decoder=self._params["decoder"],
            encoder=self._params["encoder"],
            temporal=self._temporal,
            mean_dqs=np.asarray(self._means["dqs"], np.float32),
            std_dqs=np.asarray(self._stds["dqs"], np.float32),
            mean_disp=np.asarray(self._means["displacement"], np.float32),
            std_disp=np.asarray(self._stds["displacement"], np.float32),
            means_latent=np.asarray(self._means_latent, np.float32),
            stds_latent=np.asarray(self._stds_latent, np.float32),
            mask=self._mask,
            weights=self._weights,
        )
        hyper = DragHyper(
            max_iter=self.max_iter,
            stop_eps_pos=self.stop_eps_pos,
            stop_eps_rot=self.stop_eps_rot,
            learning_rate=self.learning_rate,
            lambda_rot=self.lambda_rot,
            lambda_temporal=self.lambda_temporal,
            temporal_future_window=self.temporal_future_window,
            sample_step=cfg.TEMPORAL_PARAM["sample_step"],
            past_frames=tuple(cfg.TEMPORAL_PARAM["past_frames"]),
            height_indices=tuple(cfg.HEIGHT_INDICES),
            use_temporal=self._temporal is not None,
            joint_adjustment=None,  # adjustment is done client-side (Unity)
        )
        self._engine = DragEngine(model, self._statics, self.skeleton, hyper,
                                  cfg.TEMPORAL_PARAM)
        self._engine_dirty = False

    def _ensure_engine(self):
        if self._engine is None or self._engine_dirty:
            old_state = self._state
            self._build_engine()
            if old_state is not None:
                # resize the rollout buffer if the future window changed
                # (reference reallocates it to zeros, drag_pose.py:238-243)
                w = self.temporal_future_window + 1
                tb = np.asarray(old_state.target_buffer)
                if tb.shape[0] != w:
                    tb = np.zeros((w, tb.shape[1]), np.float32)
                self._state = old_state._replace(
                    target_buffer=tb,
                    current_index=np.zeros((), np.int32),
                )
                self._prewarm()

    # ------------------------------------------------------------------
    def init_drag_pose(self, initial_global_pos: np.ndarray,
                       initial_global_rot: np.ndarray,
                       seed: int = cfg.VAE_PARAM["seed"]) -> None:
        """Zero initial pose + heights, as the reference (run_drag.py:77-96).
        ``seed`` varies the initial-latent draw (the reference's analog is
        its fixed torch seed, eval_drag.py:23 — sweeps redirect it)."""
        import jax

        self._ensure_engine()
        j = self.skeleton.n_joints
        initial_pose = np.zeros((j * 8, cfg.VAE_PARAM["window_size"]), np.float32)
        self._state = self._engine.init_state(
            jax.random.PRNGKey(seed),
            initial_pose,
            np.asarray(initial_global_pos, np.float32).reshape(3),
            np.asarray(initial_global_rot, np.float32).reshape(4),
            np.zeros(len(cfg.HEIGHT_INDICES), np.float32),
        )
        self._prewarm()

    def _prewarm(self):
        """Run one full (discarded) ``drag_pose`` NOW so the client's first
        real frame runs at steady-state latency — this compiles the device
        step AND the host-side conversion ops (quat→matrix in,
        root-space→local out).  The reference DLL sequence (main.cpp:10-41)
        calls init before the frame loop, so the pause lands where a
        model-load wait is expected."""
        import time as _t

        j = self.skeleton.n_joints
        e = max(len(getattr(self, "_mask_indices", [0])), 1)
        t0 = _t.time()
        saved = self._state
        try:
            rot = np.tile(np.asarray([1.0, 0, 0, 0], np.float32), (e, 1))
            self.drag_pose(np.zeros((e, 3), np.float32), rot,
                           np.zeros((j, 4), np.float32),
                           np.zeros((1, 3), np.float32))
        finally:
            self._state = saved
        self.log(f"prewarm: full frame path compiled in {_t.time() - t0:.2f}s")

    def set_global_pos(self, global_pos: np.ndarray) -> None:
        self._state = self._state._replace(
            global_pos=np.asarray(global_pos, np.float32).reshape(3)
        )

    def make_batch(self, n_avatars: int) -> "RealtimeBatch":
        """Promote this session's configuration to an N-avatar batch
        (shared skeleton/model/optimizer budget; per-avatar masks)."""
        self._ensure_engine()
        return RealtimeBatch(self, n_avatars)

    def dense_targets(self, target_ee_pos: np.ndarray,
                      target_ee_rot: np.ndarray):
        """Scatter sparse end-effector targets (E,3)/(E,4 wxyz) into dense
        (J,3)/(J,4) arrays per the session's mask (inactive joints get
        identity)."""
        j = self.skeleton.n_joints
        e = len(self._mask_indices)
        tpos = np.zeros((j, 3), np.float32)
        trot = np.zeros((j, 4), np.float32)
        trot[:, 0] = 1.0
        tpos[self._mask_indices] = np.asarray(
            target_ee_pos, np.float32).reshape(e, 3)
        trot[self._mask_indices] = np.asarray(
            target_ee_rot, np.float32).reshape(e, 4)
        return tpos, trot

    def drag_pose(self, target_ee_pos: np.ndarray, target_ee_rot: np.ndarray,
                  out_pose: np.ndarray, out_global_pos: np.ndarray) -> None:
        """One realtime frame.  target_ee_rot are wxyz quaternions (E, 4).

        The quat→matrix target conversion, the frame step, and the
        root-space→parent-local output conversion run as ONE fused device
        program (``DragEngine.step_realtime``): a single dispatch + a single
        fetch per frame."""
        import jax

        self._ensure_engine()
        j = self.skeleton.n_joints
        tpos, trot = self.dense_targets(target_ee_pos, target_ee_rot)

        self._state, local, global_pos = self._engine.step_realtime(
            self._state, tpos, trot)
        local, global_pos = jax.device_get((local, global_pos))
        np.copyto(out_pose, np.asarray(local).reshape(j, 4))
        out_global_pos[0, :] = np.asarray(global_pos)


def make_batched_step(engine):
    """Build the jitted N-avatar frame step for ``engine``'s configuration:
    ``(model_b, state_b, tpos (N,J,3), trot_wxyz (N,J,4)) -> (new_state_b,
    local (N,J,4), global_pos (N,3))``.  One device program for the whole
    crowd — used by :class:`RealtimeBatch` and by the serving daemon's
    request coalescer (``runtime/server.py``), which steps concurrent
    clients' frames together.  Uses the same batch-in-lanes inner loop as
    the offline pipeline (``fast_iter.run_block`` with sync_k = max_iter
    covers the full realtime optimizer budget in one masked block)."""
    import jax
    import jax.numpy as jnp

    from dragposer_tpu.drag import engine as eng, fast_iter
    from dragposer_tpu.ops import fk, quat

    statics, skeleton = engine.statics, engine.skeleton
    hyper, tparam = engine.hyper, engine.tparam

    def _step_all(model_b, state_b, tpos, trot_quats):
        n = state_b.latent.shape[0]
        trot = jax.vmap(quat.to_matrix)(trot_quats)

        # begin: transposed rollout for the sub-batch of avatars at a
        # window boundary (current_index == 0) — at window W a whole-
        # batch rollout would discard (W-1)/W of its work.  Lockstep
        # crowds (everyone at index 0, e.g. all avatars spawned on the
        # same frame) hit the full-batch fallback; staggered/organic
        # crowds pay ~B/W lanes per frame.
        if hyper.use_temporal:
            lat, disp_acc, hts, tok0 = jax.vmap(
                lambda s: eng._rollout_inputs(s, hyper))(state_b)
            tbuf = eng._rollout_where_needed(
                model_b, hyper, tparam, lat, disp_acc, hts, tok0,
                state_b.current_index == 0, state_b.target_buffer)
            tlat = jax.vmap(lambda tb, ci: tb[ci])(
                tbuf, state_b.current_index)
        else:
            tbuf = state_b.target_buffer
            tlat = jnp.zeros_like(state_b.latent)

        ctx = fast_iter.make_context(model_b, skeleton, hyper)
        opt0 = jax.vmap(
            lambda z: eng._opt_init(z, skeleton.n_joints))(state_b.latent)
        opt = fast_iter.run_block(
            ctx, hyper, hyper.max_iter, opt0,
            jnp.ones((n,), bool), state_b,
            jnp.moveaxis(tpos, 0, -1), jnp.moveaxis(trot, 0, -1), tlat,
            model_b, statics, skeleton,
        )
        new_state, out = jax.vmap(
            lambda s, c, tb, tp: eng._finish_frame(model_b, hyper, s, c,
                                                   tb, tp)
        )(state_b, opt, tbuf, tpos)

        mean_q, std_q = eng._quat_stats(model_b)
        rs = (out.pose * std_q + mean_q).reshape(n, -1, 4)
        local = jax.vmap(lambda r: fk.from_root_quat(r, skeleton))(rs)
        return new_state, local, out.global_pos

    return jax.jit(_step_all)


def make_coalesced_step(engine, n_lanes: int):
    """Jitted frame step over ``n_lanes`` INDEPENDENT session states:
    ``(model, masks (N,J), weights (N,J,2), states tuple[DragState]*N,
    tpos (N,J,3), trot_wxyz (N,J,4), active (N,) bool) ->
    (tuple[DragState]*N, local (N,J,4), global_pos (N,3))``.

    The stack of the per-session states, the crowd step, the
    kept-only-if-active state selection, and the per-lane unstack all
    compile into ONE device program — the serving daemon dispatches a
    single executable per tick no matter how many clients coalesced
    (``runtime/server.py``).  Inactive (padding) lanes keep their input
    state bit-for-bit."""
    import jax
    import jax.numpy as jnp

    inner = make_batched_step(engine)

    def _step(model, masks, weights, states, tpos, trot, active):
        state_b = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
        model_b = model._replace(mask=masks, weights=weights)
        new_b, local, gp = inner(model_b, state_b, tpos, trot)

        def sel(n, o):
            a = active.reshape((n_lanes,) + (1,) * (n.ndim - 1))
            return jnp.where(a, n, o)

        new_b = jax.tree.map(sel, new_b, state_b)
        outs = tuple(jax.tree.map(lambda x: x[i], new_b)
                     for i in range(n_lanes))
        return outs, local, gp

    return jax.jit(_step)


class RealtimeBatch:
    """N concurrent avatars in ONE device program per frame.

    TPU-native multi-tenant serving: all avatars share the skeleton, model
    weights and optimizer budget of a configured :class:`RealtimeSession`;
    each avatar has its OWN dense end-effector mask/weights, recurrent drag
    state, and targets.  Because masks are data (not structure), per-avatar
    tracker configurations — and live mask edits, tracker dropout — never
    recompile.  A crowd of 6-/4-/3-tracker users steps together as one
    ``vmap``-ed fused frame program (the reference serves exactly one user
    per embedded interpreter).

    Build via ``RealtimeSession.make_batch(n)`` after ``load_models``::

        s = RealtimeSession(); s.set_reference_skeleton(bvh); s.load_models(d)
        s.set_mask_and_weights(mask, weights)       # default for all avatars
        batch = s.make_batch(32)
        batch.set_mask_and_weights(3, mask3, weights3)   # avatar 3 differs
        batch.init_drag_pose(gp0 (N,3), gr0 (N,4))
        local, gp = batch.drag_pose(tpos (N,J,3), trot_wxyz (N,J,4))
    """

    def __init__(self, session: RealtimeSession, n_avatars: int):
        import jax

        from dragposer_tpu.drag import engine as eng

        self.n_avatars = int(n_avatars)
        self.skeleton = session.skeleton
        engine = session._engine
        self._engine = engine
        j = self.skeleton.n_joints

        self._masks = np.tile(np.asarray(engine.model.mask)[None],
                              (n_avatars, 1)).astype(np.float32)
        self._weights = np.tile(np.asarray(engine.model.weights)[None],
                                (n_avatars, 1, 1)).astype(np.float32)

        model, statics, skeleton = engine.model, engine.statics, engine.skeleton
        hyper, tparam = engine.hyper, engine.tparam

        self._step = make_batched_step(engine)
        model_axes = jax.tree.map(lambda _: None, model)._replace(
            mask=0, weights=0)

        def _init(model_l, key, gp0, gr0):
            import jax.numpy as jnp

            # zero initial pose + heights, as the reference (run_drag.py:77-96)
            pose0 = jnp.zeros((j * 8, cfg.VAE_PARAM["window_size"]))
            return eng.init_state(
                model_l, statics, hyper, key, pose0, gp0, gr0,
                jnp.zeros(len(cfg.HEIGHT_INDICES)),
            )

        self._init_b = jax.jit(
            jax.vmap(_init, in_axes=(model_axes, 0, 0, 0)))

        def _stagger_fill(model_b, state_b):
            """Fill every avatar's prediction buffer with ONE init-time
            full-batch rollout, then spread their window phases evenly
            over [0, W).  A mass-spawned crowd otherwise steps in
            lockstep: all lanes hit ``current_index == 0`` on the same
            frame, so 1 frame in W pays the full-batch rollout (a
            latency spike that can blow the 60 fps deadline even when
            the MEAN frame time is fine) while the other W-1 pay none.
            Staggered phases put ~B/W lanes at a boundary each frame —
            inside :func:`engine.rollout_lane_budget`'s sub-batch, so
            every frame costs the same.

            Spawn-time semantics: an avatar at phase k consumes the
            k-th step of its spawn-time prediction and re-predicts
            after W-k frames — a ≤W-frame transient on the guidance
            term only (the spawn pose is zeros for every avatar, as the
            reference's ``run_drag.py:77-96``); steady state is
            identical to the unstaggered batch."""
            import jax.numpy as jnp

            n = state_b.latent.shape[0]
            w = hyper.temporal_future_window
            if not hyper.use_temporal or w <= 1:
                return state_b
            lat, disp_acc, hts, tok0 = jax.vmap(
                lambda s: eng._rollout_inputs(s, hyper))(state_b)
            tbuf = eng._temporal_rollout_core_T(
                model_b, hyper, tparam, lat, disp_acc, hts, tok0)
            phases = ((jnp.arange(n) * w) // max(n, 1)) % w
            return state_b._replace(target_buffer=tbuf,
                                    current_index=phases.astype(jnp.int32))

        self._stagger_fill = jax.jit(_stagger_fill)
        self._state = None

    def _model_b(self):
        return self._engine.model._replace(mask=self._masks,
                                           weights=self._weights)

    # ------------------------------------------------------------------
    def set_mask_and_weights(self, avatar: int, mask, weights) -> int:
        """Live per-avatar tracker configuration (no recompilation)."""
        j = self.skeleton.n_joints
        self._masks[avatar] = np.asarray(mask, np.float32).reshape(j)
        self._weights[avatar] = np.asarray(weights, np.float32).reshape(j, 2)
        return int(np.count_nonzero(self._masks[avatar]))

    def init_drag_pose(self, initial_global_pos, initial_global_rot,
                       seed: int = cfg.VAE_PARAM["seed"],
                       stagger_phases: bool = False) -> None:
        """Reset ALL avatars (zero initial pose, as ``run_drag.py:77-96``).

        ``stagger_phases``: spread the avatars' temporal-window phases
        evenly so the per-frame rollout stays inside the sub-batch lane
        budget instead of the whole crowd re-predicting on the same
        frame every W frames (see ``_stagger_fill``).  Avatars that
        join an already-running batch later (daemon coalescing) start
        at phase 0 and are naturally staggered by their join time; a
        burst of > R joiners on one frame degrades that frame to the
        full-batch rollout — bounded (one unamortized frame), never
        wrong (``engine._rollout_where_needed``)."""
        import jax

        keys = np.tile(
            np.asarray(jax.random.PRNGKey(seed))[None], (self.n_avatars, 1))
        self._state = self._init_b(
            self._model_b(), keys,
            np.asarray(initial_global_pos, np.float32).reshape(-1, 3),
            np.asarray(initial_global_rot, np.float32).reshape(-1, 4),
        )
        if stagger_phases:
            self._state = self._stagger_fill(self._model_b(), self._state)

    def drag_pose(self, target_ee_pos, target_ee_rot):
        """One frame for every avatar.  Dense targets: (N, J, 3) positions
        and (N, J, 4) wxyz quaternions (inactive joints ignored via the
        masks).  Returns (parent-local wxyz (N, J, 4), global_pos (N, 3))."""
        import jax

        self._state, local, gp = self._step(
            self._model_b(), self._state,
            np.asarray(target_ee_pos, np.float32),
            np.asarray(target_ee_rot, np.float32),
        )
        local, gp = jax.device_get((local, gp))
        return np.asarray(local), np.asarray(gp)
