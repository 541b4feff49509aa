"""Policy registries: the CBV and ego policy zoos.

API surface parity with the reference's registries
(rift/cbv/planning/__init__.py:22-34 CBV_POLICY_LIST,
rift/ego/__init__.py:19-29 EGO_POLICY_LIST), same keys. Policies here are
thin stateful wrappers over the functional cores: `act` maps SimState to the
world tick's trajectory/control interface, `train` runs the matching loss
from rift_tpu.rl.

The fine-tuned Pluto family shares one rollout driver
(models/pluto/policy.pluto_cbv_act); variants differ in the loss wired into
the optax trainer (rl/losses.py) and in what extras they record, mirroring
how the reference's Lightning trainers share RLFTPluto.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

from .models.pluto import PlutoModel, build_cbv_features
from .models.pluto.policy import pluto_cbv_act
from .rl import (
    TrainConfig,
    fit,
    grpo_loss,
    reinforce_loss,
    rift_loss,
    ring_append,
    ring_init,
    ring_reset,
    sft_loss,
)
from .rl.losses import masked_log_softmax, smooth_l1
from .rl.classic import ClassicPPO, cbv_normal_obs, rl_action_to_control
from .scenario import cbv_slot_assignment


# ---------------------------------------------------------------------------
# CBV policies
# ---------------------------------------------------------------------------
class DummyPolicy:
    """'standard' mode: no adversary — all background vehicles stay on the
    IDM autopilot (reference DummyPolicy = plain CARLA autopilot traffic)."""

    name = "standard"
    type = "unlearnable"

    def __init__(self, tmap, cfg=None):
        self.tmap = tmap

    def act(self, spec, state, train=False):
        S, A = state.alive.shape
        return {
            "traj": jnp.zeros((S, A, 1, 2)),
            "mask": jnp.zeros((S, A), bool),
        }

    def train_round(self, *a, **k):
        return []


class PlutoPolicy:
    """Frozen pretrained Pluto ('pluto')."""

    name = "pluto"
    type = "il"
    trainable = False
    loss = None

    def __init__(self, tmap, cfg=None, encoder_depth=4, decoder_depth=4, seed=0):
        cfg = cfg or {}
        self.tmap = tmap
        self.max_cbvs = cfg.get("max_cbvs", 3)
        # frame-invariant token mode (QCNet-style): encoders run once per
        # world agent / map lane instead of once per CBV view. Same param
        # tree as the reference convention — npz checkpoints interoperate —
        # but tokens are trained in a different input convention, so flip it
        # per-config, not mid-experiment.
        self.canonical = bool(cfg.get("canonical_tokens", False))
        self.model = PlutoModel(
            encoder_depth=cfg.get("encoder_depth", encoder_depth),
            decoder_depth=cfg.get("decoder_depth", decoder_depth),
        )
        self.params: Any = None
        self.rng = jax.random.PRNGKey(cfg.get("seed", seed))

    def maybe_init(self, spec, state):
        if self.params is not None:
            return
        slots = cbv_slot_assignment(state.is_cbv, self.max_cbvs)
        if self.canonical:
            feats, _, shared = build_cbv_features(
                self.tmap, state, slots, spec, canonical=True
            )
        else:
            feats, _ = build_cbv_features(self.tmap, state, slots, spec)
        flat = jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:]), feats)
        if self.canonical:
            S, C = slots.shape
            flat = dict(flat)
            flat["shared"] = {
                **shared, "scen_idx": jax.numpy.repeat(jax.numpy.arange(S), C)
            }
        self.rng, k = jax.random.split(self.rng)
        from .utils.cache import init_params_on_cpu

        self.params = init_params_on_cpu(self.model.init, k, flat)

    execute_teacher = False  # BC pretrain overrides (expert rollouts)

    def act(self, spec, state, train=False):
        self.maybe_init(spec, state)
        return pluto_cbv_act(
            self.model, self.params, self.tmap, spec, state,
            max_cbvs=self.max_cbvs, train=train and self.trainable,
            canonical=self.canonical, map_tok=self.map_tokens(),
            execute_teacher=self.execute_teacher,
        )

    def map_tokens(self):
        """Canonical per-lane map tokens, cached per (params, tmap): the
        map PointsEncoder leaves the per-tick forward (it is a pure
        function of frozen state — recomputed only after a fit or a map
        swap)."""
        if not self.canonical or self.params is None:
            return None
        src = (self.params, self.tmap)  # identity, not value, comparison
        if not all(
            a is b
            for a, b in zip(getattr(self, "_map_tok_src", (None, None)), src)
        ):
            from .models.pluto.policy import canonical_map_tokens

            self._map_tok = canonical_map_tokens(
                self.model, self.params, self.tmap
            )
            self._map_tok_src = src
        return self._map_tok

    def train_round(self, *a, **k):
        return []

    # checkpointing
    def save(self, mgr, episode):
        mgr.save(self.params, episode, name=self.name)

    def load(self, mgr, episode=None):
        params, ep = mgr.restore(self.params, episode, name=self.name)
        if params is not None:
            self.params = params
        return ep

    def load_pretrain(self, npz_path: str):
        """Load a canonical pretrained Pluto npz (utils/params_io format) —
        the `pluto_1M_aux_cil.ckpt` load path of the reference
        (rift/cbv/planning/pluto/pluto.py:130-137). Keys absent from the
        file (e.g. ppo_pluto's value head) keep their fresh init. Call
        after `maybe_init` (needs the params template)."""
        from .utils.params_io import load_params_npz, merge_params

        assert self.params is not None, "call maybe_init first"
        self.params = merge_params(self.params, load_params_npz(npz_path))

    def save_pretrain(self, npz_path: str):
        from .utils.params_io import save_params_npz

        save_params_npz(self.params, npz_path)


class _FineTunedPluto(PlutoPolicy):
    """Shared machinery of the fine-tuned family (RLFTPluto equivalent)."""

    trainable = True
    buffer_capacity = 4096

    def __init__(self, tmap, cfg=None, **kw):
        super().__init__(tmap, cfg, **kw)
        cfg = cfg or {}
        self.buffer = None
        tc = cfg.get("train", TrainConfig())
        if isinstance(tc, dict):  # yaml configs carry a plain dict
            fields = TrainConfig.__dataclass_fields__
            tc = TrainConfig(**{
                k: (tuple(v) if k == "trainable_prefixes" else v)
                for k, v in tc.items() if k in fields
            })
        self.train_cfg = tc
        self.buffer_capacity = cfg.get("buffer_capacity", self.buffer_capacity)
        self.train_rounds = 0
        self.ref_params = None  # frozen pretrain copy (GRPO)

    # what lands in the ring buffer (rollout.rollout_chunk extras keys)
    SAMPLE_KEYS = (
        "old_logits", "advantage", "valid", "rollout_return", "chosen_idx",
        "teacher_speed", "teacher_pos", "teacher_traj", "value", "reward",
        "ret", "ret_shaped", "gae", "gae_valid",
    )

    def store_chunk(self, extras):
        merge = lambda x: x.reshape((-1,) + x.shape[2:])
        samples = {
            "features": jax.tree.map(merge, extras["features"]),
        }
        for k in self.SAMPLE_KEYS:
            if k in extras:
                samples[k] = merge(extras[k])
        if self.buffer is None:
            spec = jax.tree.map(lambda x: x[0], samples)
            self.buffer = ring_init(spec, capacity=self.buffer_capacity)
        self.buffer = ring_append(self.buffer, samples, merge(extras["sample_valid"]))

    def buffer_full(self):
        return self.buffer is not None and bool(self.buffer.full)

    def _loss_fn(self, params, batch, rng):
        raise NotImplementedError

    def load_pretrain(self, npz_path: str):
        """Fine-tuned variants also anchor GRPO's KL reference to the
        pretrain (grpo_trainer.py:140-196 penalises KL to the PRETRAINED
        policy, not to whatever the params were at the first update)."""
        super().load_pretrain(npz_path)
        self.ref_params = self.params

    def train_round(self, rng=None):
        if self.buffer is None or int(self.buffer.size) == 0:
            return []
        rng = rng if rng is not None else jax.random.PRNGKey(self.train_rounds)
        if self.ref_params is None:
            # fallback when no pretrain was loaded: snapshot before the
            # first update (KL-to-init; load_pretrain anchors it properly)
            if self.name == "grpo_pluto":
                import warnings

                warnings.warn(
                    "grpo_pluto trained WITHOUT --pretrain: the KL penalty "
                    "anchors to the randomly-initialised first-update "
                    "snapshot, not to a pretrained policy — the reference "
                    "always anchors to the pretrain "
                    "(grpo_trainer.py:140-196). Pass --pretrain <npz>.",
                    stacklevel=2,
                )
            self.ref_params = self.params
        self.params, losses = fit(
            self.params, self.buffer, self._loss_fn, self.train_cfg, rng,
            round_idx=self.train_rounds,
        )
        self.train_rounds += 1
        self.buffer = ring_reset(self.buffer)
        return losses


class RIFTPlutoPolicy(_FineTunedPluto):
    """'rift_pluto' — the flagship (dual-clip group-relative objective)."""

    name = "rift_pluto"
    type = "rlft"

    def _loss_fn(self, params, batch, rng):
        out = self.model.apply(params, batch["features"])
        r_pad = ~batch["features"]["reference_line"]["valid_mask"].any(-1)
        return rift_loss(
            out["probability"], r_pad, batch["old_logits"],
            batch["advantage"], batch["valid"],
        )


class GRPOPlutoPolicy(_FineTunedPluto):
    """'grpo_pluto' — PPO clip + KL to the frozen pretrain policy."""

    name = "grpo_pluto"
    type = "rlft"

    def _loss_fn(self, params, batch, rng):
        out = self.model.apply(params, batch["features"])
        r_pad = ~batch["features"]["reference_line"]["valid_mask"].any(-1)
        ref_out = self.model.apply(jax.lax.stop_gradient(self.ref_params), batch["features"])
        return grpo_loss(
            out["probability"], r_pad, batch["old_logits"],
            ref_out["probability"], batch["advantage"], batch["valid"],
        )


def _candidate_speeds(trajectory: jnp.ndarray, dt: float = 0.1):
    """[bs, R, M] desired speed each candidate implies: mean waypoint spacing
    over the first second / dt (batch_control_pid desired-speed semantics,
    pid_controller.py:102-155)."""
    step_d = jnp.linalg.norm(
        jnp.diff(trajectory[..., :10, :2], axis=-2), axis=-1
    )
    return step_d.mean(-1) / dt


TEACHER_HORIZON_STEP = 39  # candidate waypoint compared to the teacher pose
TEACHER_SPEED_WEIGHT = 2.0  # m per (m/s) of speed mismatch in the score


def _teacher_label(prob, r_pad, trajectory, teacher_speed, teacher_pos=None):
    """Flattened R*M teacher index (sft_trainer.py:182-215
    generate_target_label): the candidate matching the privileged
    AutoPilot's POSE and SPEED.

    With `teacher_pos` ([bs, 2] local-frame pose the teacher reaches at the
    4 s horizon along its own route): score every candidate by its
    horizon-waypoint distance to that pose plus a weighted implied-speed
    mismatch, argmin over all valid R*M — so a candidate that turns off the
    teacher's road loses to one that follows it even at a worse speed.
    Without it (legacy r1 label): keep the model's best reference line and
    pick the speed-closest mode."""
    bs, R, M = prob.shape
    cand_speed = _candidate_speeds(trajectory)  # [bs, R, M]
    if teacher_pos is not None:
        T = trajectory.shape[-2]
        step = min(TEACHER_HORIZON_STEP, T - 1)
        cand_end = trajectory[..., step, :2]  # [bs, R, M, 2]
        pose_d = jnp.linalg.norm(
            cand_end - teacher_pos[:, None, None], axis=-1
        )
        score = pose_d + TEACHER_SPEED_WEIGHT * jnp.abs(
            cand_speed - teacher_speed[:, None, None]
        )
        score = jnp.where(r_pad[:, :, None], jnp.inf, score)
        return jnp.argmin(score.reshape(bs, -1), axis=-1)
    masked = jnp.where(r_pad[:, :, None], -1e8, prob).reshape(bs, -1)
    best_r = jnp.argmax(masked, axis=-1) // M
    speed_at_r = jnp.take_along_axis(
        cand_speed, best_r[:, None, None].repeat(M, -1), axis=1
    )[:, 0]  # [bs, M]
    m_idx = jnp.argmin(
        jnp.abs(speed_at_r - teacher_speed[:, None]), axis=-1
    )
    return best_r * M + m_idx


class ReinforcePlutoPolicy(_FineTunedPluto):
    """'reinforce_pluto' — chosen-candidate log-prob x discounted episodic
    env return (reinforce_trainer.py:120-170): the return is the
    gamma=0.98-discounted sum of the executed transitions' dense env rewards
    (chunk-truncated with critic bootstrap, rollout.py:_chunk_returns)."""

    name = "reinforce_pluto"
    type = "rlft"
    RETURN_KEY = "ret"

    def _loss_fn(self, params, batch, rng):
        out = self.model.apply(params, batch["features"])
        r_pad = ~batch["features"]["reference_line"]["valid_mask"].any(-1)
        return reinforce_loss(
            out["probability"], r_pad, batch["chosen_idx"],
            batch[self.RETURN_KEY],
        )


class RSPlutoPolicy(ReinforcePlutoPolicy):
    """'rs_pluto' — REINFORCE on the SHAPED return: env reward +
    0.2 * (-|teacher IDM target speed - executed desired speed|)
    (rs_pluto.py:134-137, rs_datamodule.yaml reward_lambda)."""

    name = "rs_pluto"
    RETURN_KEY = "ret_shaped"


class SFTPlutoPolicy(_FineTunedPluto):
    """'sft_pluto' — cross-entropy to the privileged teacher's candidate:
    best reference line + the mode whose implied speed matches the teacher's
    IDM target speed (sft_trainer.py:123-215 generate_target_label; teacher
    = sim/world.autopilot_target_speed, the AutoPilot-equivalent)."""

    name = "sft_pluto"
    type = "sft"

    def _loss_fn(self, params, batch, rng):
        out = self.model.apply(params, batch["features"])
        r_pad = ~batch["features"]["reference_line"]["valid_mask"].any(-1)
        bs = out["probability"].shape[0]
        teacher = _teacher_label(
            out["probability"], r_pad, out["trajectory"],
            batch["teacher_speed"], batch.get("teacher_pos"),
        )
        return sft_loss(
            out["probability"], r_pad, teacher,
            batch["valid"].reshape(bs, -1).any(-1),
        )


class BCPlutoPolicy(_FineTunedPluto):
    """'bc_pluto' — bootstrap behavior-cloning PRETRAIN of the full model.

    The reference's `pluto` row starts from `pluto_1M_aux_cil.ckpt`, a
    nuPlan-1M imitation pretrain (rift/cbv/planning/pluto/pluto.py:130-137)
    that is not shipped. This policy is the on-device bootstrap equivalent
    (VERDICT r1 item 1b): every layer trains (not just pi_head) to imitate
    the privileged lane-follow teacher —
      * winner-takes-all regression: the candidate closest to the teacher
        trajectory is pulled onto it (the CIL objective shape of the Pluto
        paper's pretraining),
      * selection cross-entropy toward that winning candidate,
      * ref-free-head regression toward the teacher trajectory.
    The result (`save_pretrain`) seeds the whole fine-tune zoo via
    `load_pretrain` (tools/quality_experiment.py)."""

    name = "bc_pluto"
    type = "il"
    # expert rollouts: during pretrain collection the CBVs EXECUTE the
    # privileged teacher's trajectory, so cloning sees the expert's state
    # visitation (the nuPlan-1M-log equivalent) instead of the untrained
    # student's crawl states — without this, BC chases a moving slow target
    # and converges to the r3 table's 0.4 m/s crawl equilibrium
    execute_teacher = True

    def __init__(self, tmap, cfg=None, **kw):
        super().__init__(tmap, cfg, **kw)
        if not (cfg or {}).get("train"):
            # default: train the FULL model, no CL decay. From-scratch
            # pretraining needs a real step size — the fine-tune defaults
            # (lr 1e-4, global-norm clip 0.5) barely move a random-init
            # model under the meter-scale WTA regression loss.
            self.train_cfg = self.train_cfg.replace(
                trainable_prefixes=(), cl_lr_decay=1.0, lr=1e-3,
                grad_clip=5.0,
            )

    def _loss_fn(self, params, batch, rng):
        out = self.model.apply(params, batch["features"])
        r_pad = ~batch["features"]["reference_line"]["valid_mask"].any(-1)
        bs, R, M = out["probability"].shape
        # all 80 frames regressed: sparse anchors let the in-between frames
        # collapse to the origin and the PID reads the raw candidate
        cand = out["trajectory"][..., :2]  # [bs, R, M, F, 2]
        tt = batch["teacher_traj"]  # [bs, F, 2]
        ade = jnp.linalg.norm(cand - tt[:, None, None], axis=-1).mean(-1)
        ade = jnp.where(r_pad[:, :, None], jnp.inf, ade)  # [bs, R, M]
        flat_ade = ade.reshape(bs, -1)
        target = jnp.argmin(flat_ade, axis=-1)
        wta = jnp.take_along_axis(flat_ade, target[:, None], axis=1)[:, 0]
        w = (batch["valid"].reshape(bs, -1).any(-1) & jnp.isfinite(wta)).astype(
            jnp.float32
        )
        n = jnp.maximum(w.sum(), 1.0)
        reg = jnp.sum(jnp.where(w > 0, wta, 0.0)) / n
        ce = sft_loss(out["probability"], r_pad, target, w > 0)
        rf = out["output_ref_free_trajectory"][..., :2]  # [bs, F, 2]
        rf_reg = (
            jnp.sum(jnp.linalg.norm(rf - tt, axis=-1).mean(-1) * w) / n
        )
        return reg + ce + 0.5 * rf_reg


class RTRPlutoPolicy(_FineTunedPluto):
    """'rtr_pluto' — RTR: PPO-clip on the executed candidate (GAE advantage)
    + teacher CE (rtr_trainer.py:130-173)."""

    name = "rtr_pluto"
    type = "sft"
    lambda_rl = 5.0

    def _ppo_term(self, prob, r_pad, batch):
        bs = prob.shape[0]
        chosen = batch["chosen_idx"]
        adv = jax.lax.stop_gradient(batch["gae"])
        w = batch["gae_valid"].astype(jnp.float32)
        old_lp = jnp.take_along_axis(
            masked_log_softmax(batch["old_logits"], r_pad), chosen[:, None],
            axis=1,
        )[:, 0]
        lp = masked_log_softmax(prob, r_pad)
        cur_lp = jnp.take_along_axis(lp, chosen[:, None], axis=1)[:, 0]
        ratio = jnp.exp(cur_lp - jax.lax.stop_gradient(old_lp))
        obj = jnp.minimum(adv * ratio, adv * jnp.clip(ratio, 0.8, 1.2))
        n = jnp.maximum(w.sum(), 1.0)
        surrogate = jnp.sum(obj * w) / n
        entropy = -jnp.sum(jnp.exp(lp) * jnp.maximum(lp, -1e6), axis=-1).mean()
        return surrogate, entropy

    def _loss_fn(self, params, batch, rng):
        out = self.model.apply(params, batch["features"])
        r_pad = ~batch["features"]["reference_line"]["valid_mask"].any(-1)
        prob = out["probability"]
        bs = prob.shape[0]
        surrogate, _ = self._ppo_term(prob, r_pad, batch)
        teacher = _teacher_label(
            prob, r_pad, out["trajectory"], batch["teacher_speed"],
            batch.get("teacher_pos"),
        )
        teacher_ce = sft_loss(
            prob, r_pad, teacher, batch["valid"].reshape(bs, -1).any(-1)
        )
        return -self.lambda_rl * surrogate + teacher_ce


class PPOPlutoPolicy(RTRPlutoPolicy):
    """'ppo_pluto' — actor-critic PPO: clipped surrogate on the executed
    candidate with GAE(lambda) advantage, entropy bonus, and a SmoothL1
    value loss on the critic head (ppo_trainer.py:126-184 +
    ppo_datamodule.py GAE). The value head trains alongside pi_head."""

    name = "ppo_pluto"
    type = "rlft"
    lambda_rl = 1.0
    VALUE_COEF = 0.5

    def __init__(self, tmap, cfg=None, **kw):
        super().__init__(tmap, cfg, **kw)
        # rebuild the model with the critic head; widen the trainable set
        self.model = PlutoModel(
            encoder_depth=(cfg or {}).get("encoder_depth", 4),
            decoder_depth=(cfg or {}).get("decoder_depth", 4),
            value_head=True,
        )
        if "value_head" not in self.train_cfg.trainable_prefixes:
            self.train_cfg = self.train_cfg.replace(
                trainable_prefixes=tuple(self.train_cfg.trainable_prefixes)
                + ("value_head",)
            )

    def _loss_fn(self, params, batch, rng):
        out = self.model.apply(params, batch["features"])
        r_pad = ~batch["features"]["reference_line"]["valid_mask"].any(-1)
        prob = out["probability"]
        surrogate, entropy = self._ppo_term(prob, r_pad, batch)
        # critic regression target: GAE + V_old = lambda-return
        target = jax.lax.stop_gradient(batch["gae"] + batch["value"])
        w = batch["gae_valid"].astype(jnp.float32)
        n = jnp.maximum(w.sum(), 1.0)
        v_loss = jnp.sum(smooth_l1(out["value"], target) * w) / n
        return -(surrogate + 0.01 * entropy) + self.VALUE_COEF * v_loss


class ClassicCBVPolicy:
    """'ppo' / 'frea' / 'fppo_rs' — MLP PPO on the 3-agent relative-state
    observation driving (acc, steer) directly (rift/cbv/planning/rl/ppo.py;
    FREA and FPPO-RS are load-only variants of the same net in the reference,
    rl/frea.py:12-35)."""

    name = "ppo"
    type = "rl"
    trainable = True

    def __init__(self, tmap, cfg=None):
        cfg = cfg or {}
        self.tmap = tmap
        self.max_cbvs = cfg.get("max_cbvs", 3)
        self.ppo = ClassicPPO(seed=cfg.get("seed", 0))
        self.rng = jax.random.PRNGKey(cfg.get("seed", 0))

    def act(self, spec, state, train=False):
        S, A = state.alive.shape
        slots = cbv_slot_assignment(state.is_cbv, self.max_cbvs)

        def one(scenario, slot):
            obs = cbv_normal_obs(state, scenario, jnp.maximum(slot, 0))
            return obs

        scen = jnp.broadcast_to(jnp.arange(S)[:, None], slots.shape)
        obs = jax.vmap(jax.vmap(one))(scen, slots)  # [S, C, rows, 6]
        self.rng, k = jax.random.split(self.rng)
        flat_obs = obs.reshape((-1,) + obs.shape[2:])
        action, logp = self.ppo.act(
            self.ppo.params, flat_obs, k, deterministic=not train
        )
        ctrl_sc = rl_action_to_control(action).reshape(S, slots.shape[1], 3)
        ctrl = jnp.zeros((S, A, 3))
        valid = slots >= 0
        slot = jnp.maximum(slots, 0)
        ctrl = jax.vmap(
            lambda t, sl, w, v: t.at[sl].set(jnp.where(v[:, None], w, t[sl]))
        )(ctrl, slot, ctrl_sc, valid)
        mask = jnp.zeros((S, A), bool)
        mask = jax.vmap(lambda m, sl, v: m.at[sl].set(v | m[sl]))(mask, slot, valid)
        mask = mask.at[:, 0].set(False)
        value = self.ppo.value(self.ppo.params, flat_obs).reshape(slots.shape)
        return {"ctrl": ctrl, "mask": mask, "obs": obs,
                "logp": logp.reshape(slots.shape),
                "action": action.reshape(slots.shape + (2,)),
                "value": value, "cbv_slots": slots}

    def train_round(self, batch):
        return self.ppo.train(batch)

    def save(self, mgr, episode):
        mgr.save(self.ppo.params._asdict(), episode, name=f"cbv_{self.name}")


class FREAPolicy(ClassicCBVPolicy):
    """'frea' — in the reference this LOADS pretrained FREA weights (a
    feasibility-aware PPO trained in the FREA repo; rl/frea.py:12-35 is
    load-only). No weights ship with the repo, so without a
    `cfg['weights']` checkpoint path this runs the same PPO architecture
    from scratch and says so loudly."""

    name = "frea"

    def __init__(self, tmap, cfg=None):
        super().__init__(tmap, cfg)
        path = (cfg or {}).get("weights", "")
        if path:
            self.load_weights(path)
        else:
            import warnings

            warnings.warn(
                f"{self.name}: reference behavior is load-only pretrained "
                "weights (rl/frea.py); none provided via cfg['weights'] — "
                "running an untrained PPO net instead.",
                stacklevel=2,
            )

    def load_weights(self, path):
        """Restore pretrained actor/critic nets from a CheckpointManager dir
        (the `model.torch_*` load of the reference, rl/frea.py:20-35)."""
        from .utils.checkpoint import CheckpointManager

        mgr = CheckpointManager(path)
        restored, _ = mgr.restore(
            self.ppo.params._asdict(), name=f"cbv_{self.name}"
        )
        if restored is not None:
            self.ppo.params = self.ppo.params.__class__(**restored)


class FPPORsPolicy(FREAPolicy):
    """'fppo_rs' — same load-only contract as FREA (reference rl/frea.py)."""

    name = "fppo_rs"


CBV_POLICY_LIST: dict[str, Callable] = {
    "standard": DummyPolicy,
    "ppo": ClassicCBVPolicy,
    "frea": FREAPolicy,
    "fppo_rs": FPPORsPolicy,
    "pluto": PlutoPolicy,
    "bc_pluto": BCPlutoPolicy,
    "sft_pluto": SFTPlutoPolicy,
    "rtr_pluto": RTRPlutoPolicy,
    "rs_pluto": RSPlutoPolicy,
    "reinforce_pluto": ReinforcePlutoPolicy,
    "ppo_pluto": PPOPlutoPolicy,
    "grpo_pluto": GRPOPlutoPolicy,
    "rift_pluto": RIFTPlutoPolicy,
}


# ---------------------------------------------------------------------------
# Ego policies
# ---------------------------------------------------------------------------
class PDMLiteEgo:
    """'pdm_lite' — the default privileged rule expert."""

    name = "pdm_lite"
    type = "unlearnable"

    def __init__(self, tmap, cfg=None):
        self.tmap = tmap

    def act(self, spec, state):
        from .ego.pdm_ego import pdm_ego_waypoints

        return pdm_ego_waypoints(spec, state, self.tmap)


class BehaviorEgo(PDMLiteEgo):
    """'behavior' — CARLA BehaviorAgent equivalent: the simpler leader-gap
    IDM route follower (ego/rule_ego.py)."""

    name = "behavior"

    def act(self, spec, state):
        from .ego.rule_ego import rule_ego_waypoints

        return rule_ego_waypoints(spec, state)


class ExpertEgo(PDMLiteEgo):
    """'expert' — leaderboard-autopilot variant: the PDM core plus
    privileged lane changes — a slow same-lane leader with a clear adjacent
    lane is overtaken instead of followed (ego/pdm_ego.py lane_change;
    reference privileged_route_planner.py:869), so the expert differs
    behaviorally from pdm_lite wherever overtaking is possible."""

    name = "expert"

    def act(self, spec, state):
        from .ego.pdm_ego import pdm_ego_waypoints

        return pdm_ego_waypoints(spec, state, self.tmap, lane_change=True)


class ExpertDisturbEgo(ExpertEgo):
    """'expert_disturb' — expert with injected waypoint noise
    (rift/ego/expert_disturb.py:56)."""

    name = "expert_disturb"

    def __init__(self, tmap, cfg=None, noise_std=0.3, seed=0):
        super().__init__(tmap, cfg)
        self.noise_std = (cfg or {}).get("noise_std", noise_std)
        self.rng = jax.random.PRNGKey(seed)

    def act(self, spec, state):
        wp = super().act(spec, state)
        self.rng, k = jax.random.split(self.rng)
        return wp + self.noise_std * jax.random.normal(k, wp.shape)


class PlanTEgo:
    """'plant' — learned object-token transformer ego."""

    name = "plant"
    type = "il"

    def __init__(self, tmap, cfg=None, seed=0):
        from .models.plant import PlanTModel

        cfg = cfg or {}
        self.tmap = tmap
        self.model = PlanTModel(
            dim=cfg.get("dim", 512),
            num_layers=cfg.get("num_layers", 8),
            num_heads=cfg.get("num_heads", 8),
        )
        self.params = None
        self.rng = jax.random.PRNGKey(cfg.get("seed", seed))

    def act(self, spec, state):
        from .models.plant import build_plant_tokens, plant_ego_waypoints

        if self.params is None:
            tokens, target, light = build_plant_tokens(spec, state)
            self.rng, k = jax.random.split(self.rng)
            self.params = jax.jit(self.model.init)(k, tokens, target, light)
        return plant_ego_waypoints(self.model, self.params, spec, state)

    def load(self, path):
        """Trained PlanT npz (models/plant/train.py save_plant_params) —
        the reference's plant_agent checkpoint load (plant_agent.py:29).
        The npz's dims must match this ego's cfg (dim/num_layers)."""
        from .models.plant.train import load_plant_params

        self.params = load_plant_params(path)


class EgoPPO:
    """'ppo' — MLP PPO ego on the relative-state obs (rift/ego/rl/ppo.py).

    `act` returns a dict with raw `ctrl` [S, 3] for env_step's ego_ctrl
    input plus the (obs, action, logp, value) the GAE batch needs."""

    name = "ppo"
    type = "rl"
    trainable = True

    def __init__(self, tmap, cfg=None):
        self.tmap = tmap
        self.ppo = ClassicPPO(seed=(cfg or {}).get("seed", 0))
        self.rng = jax.random.PRNGKey(0)

    def act(self, spec, state, train=False):
        from .rl.classic import ego_normal_obs

        cursor = jnp.minimum(
            state.ego_route_cursor.astype(jnp.int32) + 10,
            spec.ego_route_len - 1,
        )
        next_wp = jnp.take_along_axis(
            spec.ego_route[..., :2], cursor[:, None, None].repeat(2, -1), axis=1
        )[:, 0]
        obs = ego_normal_obs(state, next_wp)
        self.rng, k = jax.random.split(self.rng)
        action, logp = self.ppo.act(
            self.ppo.params, obs, k, deterministic=not train
        )
        return {
            "ctrl": rl_action_to_control(action),  # [S, 3]
            "obs": obs,
            "action": action,
            "logp": logp,
            "value": self.ppo.value(self.ppo.params, obs),
        }

    def train_round(self, batch):
        return self.ppo.train(batch)

    def save(self, mgr, episode):
        mgr.save(self.ppo.params._asdict(), episode, name="ego_ppo")


class E2EEgo:
    """'vad' / 'uniad' / 'sparsedrive' — end-to-end camera AV stacks on
    the synthetic semantic-camera bridge (ego/sensors.py; the reference's
    UE4 sensor rig, rift/ego/b2d/e2e_agent.py:20-142). Weights load from
    an npz (cfg['weights'] or --pretrain); `train_bc` bootstraps them by
    cloning the PDM expert closed-loop (models/e2e/train.py)."""

    type = "il"

    def __init__(self, tmap, cfg=None, seed=0):
        from .models.e2e import E2EModel

        cfg = cfg or {}
        self.tmap = tmap
        self.model = E2EModel(
            variant=self.name,
            dim=cfg.get("dim", 64),
            num_heads=cfg.get("num_heads", 4),
        )
        self.params = None
        self.rng = jax.random.PRNGKey(cfg.get("seed", seed))
        w = cfg.get("weights")
        if w:
            self.load(w)

    def act(self, spec, state):
        from .models.e2e import e2e_ego_waypoints, e2e_inputs

        if self.params is None:
            imgs, target, speed = e2e_inputs(spec, state, self.tmap)
            self.rng, k = jax.random.split(self.rng)
            self.params = jax.jit(self.model.init)(k, imgs, target, speed)
        return e2e_ego_waypoints(self.model, self.params, self.tmap, spec, state)

    def train_bc(self, spec, state, crit, **kw):
        from .models.e2e import bc_train

        self.params, losses = bc_train(
            self.name, self.tmap, spec, state, crit, **kw
        )
        return losses

    def load(self, path):
        from .utils.params_io import load_params_npz

        self.params = load_params_npz(path)

    def save(self, path):
        from .utils.params_io import save_params_npz

        save_params_npz(self.params, path)


class VADEgo(E2EEgo):
    name = "vad"


class UniADEgo(E2EEgo):
    name = "uniad"


class SparseDriveEgo(E2EEgo):
    name = "sparsedrive"


EGO_POLICY_LIST: dict[str, Callable] = {
    "behavior": BehaviorEgo,
    "ppo": EgoPPO,
    "expert": ExpertEgo,
    "plant": PlanTEgo,
    "expert_disturb": ExpertDisturbEgo,
    "pdm_lite": PDMLiteEgo,
    "vad": VADEgo,
    "uniad": UniADEgo,
    "sparsedrive": SparseDriveEgo,
}

# recognition registry (rift/cbv/recognition/__init__.py:12)
from .scenario.recognition import attn_recognize_cbvs, recognize_cbvs  # noqa: E402

CBV_RECOGNITION_LIST = {
    "rule": recognize_cbvs,
    "attention": attn_recognize_cbvs,
}
