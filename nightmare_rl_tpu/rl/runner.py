"""On-policy training runner: the rsl_rl OnPolicyRunner equivalent.

Host-side orchestration around the fully-jitted PPO iteration: metric logging
(TensorBoard when available), periodic orbax checkpoints named like the
reference's ``model_<iter>`` (envs/helpers.py:35-39, save_interval
envs/nightmare_v3_config.py:139), latest-run/latest-checkpoint resume
resolution (envs/helpers.py:20-42), wall-clock step-rate reporting, and two
capabilities the reference lacks (SURVEY §5): checkpoint-on-signal
(SIGTERM/SIGINT trigger a final save before exit — preemption safety for pod
slices) and optional jax.profiler traces per iteration window.
"""

from __future__ import annotations

import os
import signal
import time
from typing import Optional

import jax
import numpy as np

from nightmare_rl_tpu.core.config import PPOCfg
from nightmare_rl_tpu.rl.ppo import PPO, TrainState
from nightmare_rl_tpu.utils import checkpoint as ckpt
from nightmare_rl_tpu.utils.recorder import StateRecorder


class JsonlWriter:
    """Metrics sink used when torch.utils.tensorboard is unavailable — a
    TPU-native framework must not need torch to log.  One JSON object per
    add_scalar, appended to <log_dir>/metrics.jsonl."""

    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        self._f = open(os.path.join(log_dir, "metrics.jsonl"), "a")

    def add_scalar(self, tag: str, value: float, step: int) -> None:
        import json

        self._f.write(json.dumps({"tag": tag, "value": value, "step": step}))
        self._f.write("\n")

    def flush(self) -> None:
        self._f.flush()


class TrainingViewer:
    """Render-during-training parity (reference cfg.viewer.render syncs a
    viewer every env step, envs/nightmare_v3_env.py:373-390): env 0's frames
    from each rollout window are injected into a passive mujoco.viewer with
    the commanded-velocity arrow drawn.  Headless-safe: disables itself if no
    display/viewer is available."""

    def __init__(self, xml: str):
        self._viewer = None
        self._dead = False
        self._xml = xml

    def show(self, qpos, cmd) -> None:
        if self._dead:
            return
        try:
            import mujoco as mj

            if self._viewer is None:
                import mujoco.viewer as mjv

                self._m = mj.MjModel.from_xml_path(self._xml)
                self._d = mj.MjData(self._m)
                self._viewer = mjv.launch_passive(self._m, self._d)
            from nightmare_rl_tpu.tools.play import draw_command_arrow

            for k in range(qpos.shape[0]):
                if not self._viewer.is_running():
                    self._dead = True
                    return
                self._d.qpos[:] = np.asarray(qpos[k], np.float64)
                mj.mj_forward(self._m, self._d)
                draw_command_arrow(self._viewer, self._d.qpos, cmd[k])
                self._viewer.cam.lookat = self._d.qpos[:3]
                self._viewer.sync()
        except Exception as e:
            print(f"viewer unavailable, disabling render: {e}")
            self._dead = True


class OnPolicyRunner:
    def __init__(self, env, cfg: PPOCfg, log_dir: Optional[str] = None,
                 writer=None, mesh=None):
        """mesh: a jax.sharding.Mesh — envs are then sharded over it via
        ShardedPPO and the same runner drives the multi-device training
        (checkpoints, metrics, preemption handling all included)."""
        self.env = env
        self.cfg = cfg
        self.log_dir = log_dir
        # training-time trajectory recording (reference records env 0 by
        # default, cfg.viewer.record_states / envs/nightmare_v3_env.py:261-272)
        # and render-during-training; both consume the same env-0 stream
        viewer_cfg = getattr(env.cfg, "viewer", None)
        record = (
            log_dir is not None
            and getattr(viewer_cfg, "record_states", False)
        )
        render = getattr(viewer_cfg, "render", False)
        if mesh is not None:
            from nightmare_rl_tpu.parallel.mesh import ShardedPPO

            self.ppo = ShardedPPO(env, cfg, mesh)
            record = False  # env 0 lives on one shard; see ShardedPPO
            render = False
        else:
            self.ppo = PPO(env, cfg, record_states=record or render)
        self.recorder = (
            StateRecorder(log_dir, dt=env.dt) if record else None
        )
        self.viewer = (
            TrainingViewer(getattr(viewer_cfg, "xml_path",
                           "/root/reference/models/nightmare_v3/mjmodel.xml"))
            if render else None
        )
        self.ts: TrainState | None = None
        self.writer = writer
        self._writer_pending = writer is None and log_dir is not None

    def init(self, seed: Optional[int] = None) -> TrainState:
        self.ts = self.ppo.init(seed)
        return self.ts

    def load(self, path: str) -> TrainState:
        assert self.ts is not None, "call init() before load()"
        self.ts = ckpt.restore(path, self.ts)
        return self.ts

    def save(self, it: int) -> None:
        if self.log_dir is None:
            return
        path = os.path.join(self.log_dir, f"model_{it}")
        ckpt.save(path, self.ts)

    def learn(self, num_learning_iterations: int,
              init_at_random_ep_len: bool = False,
              profile_dir: Optional[str] = None) -> TrainState:
        if self.ts is None:
            self.init()

        # checkpoint-on-signal: a preempted run saves model_<iter> and exits
        # cleanly so `-r` resumes deterministically (the reference's only
        # recovery is manual restart from the last periodic save)
        stop = {"flag": False}

        def _on_signal(signum, frame):
            stop["flag"] = True

        prev_handlers = {
            s: signal.signal(s, _on_signal)
            for s in (signal.SIGTERM, signal.SIGINT)
        }
        if init_at_random_ep_len:
            self.ts = self.ppo.randomize_episode_lengths(self.ts)
        # writer is created lazily so resume-path resolution never sees the
        # new (empty) run dir (rsl_rl creates its writer in learn() too)
        if self._writer_pending:
            self._writer_pending = False
            try:
                from torch.utils.tensorboard import SummaryWriter

                self.writer = SummaryWriter(log_dir=self.log_dir)
            except Exception:
                self.writer = JsonlWriter(self.log_dir)

        steps_per_iter = (
            self.cfg.runner.num_steps_per_env * self.env.num_envs
        )
        t_start = time.time()
        iters_run = 0
        for k in range(num_learning_iterations):
            iters_run = k + 1
            if profile_dir and k == 2:  # skip compile iterations
                jax.profiler.start_trace(profile_dir)
            t0 = time.time()
            self.ts, stats = self.ppo.learn_step(self.ts)
            # ONE batched device->host fetch for everything this iteration
            # reads.  Per-scalar float() fetches cost a full tunnel RTT
            # (~0.35 s) EACH on the axon backend; the old code made ~11 of
            # them per iteration (writer block + prints), turning a 1.38 s
            # device iteration into a 5.8 s wall iteration (round-5
            # measurement, yaw_r5 run).
            stats, it64 = jax.device_get((stats, self.ts.iteration))
            it = int(it64)
            loss = float(stats["loss"])
            if not np.isfinite(loss):
                # never checkpoint a diverged state: a NaN save poisons the
                # resume chain (the supervisor would loop on it forever)
                print(f"iter {int(self.ts.iteration)}: loss is {loss} — "
                      "aborting WITHOUT saving; resume from the last good "
                      "checkpoint")
                for s, h in prev_handlers.items():
                    signal.signal(s, h)
                raise FloatingPointError("training diverged (non-finite loss)")
            if self.ppo.record_states:
                qp, qv, act, done, cmd = stats["record"]
                if self.recorder is not None:
                    self.recorder.add_steps(qp, qv, act, done)
                if self.viewer is not None:
                    self.viewer.show(np.asarray(qp), np.asarray(cmd))
            dt_iter = time.time() - t0
            if profile_dir and k == 4:
                try:
                    jax.profiler.stop_trace()
                    print(f"profiler trace written to {profile_dir}")
                except Exception as e:  # not supported on all backends
                    print(f"profiler unavailable: {e}")

            if self.writer is not None:
                for key in ("loss", "surrogate_loss", "value_loss", "kl", "lr",
                            "mean_reward", "mean_noise_std"):
                    self.writer.add_scalar(f"train/{key}", float(stats[key]), it)
                ep = np.asarray(stats["episode_reward_means"])
                for name, val in zip(self.env.active_rewards, ep):
                    self.writer.add_scalar(f"episode/rew_{name}", float(val), it)
                self.writer.add_scalar(
                    "perf/env_steps_per_s", steps_per_iter / dt_iter, it
                )
            if it % 10 == 0 or k == 0:
                print(
                    f"iter {it}: reward {float(stats['mean_reward']):+.4f} "
                    f"loss {float(stats['loss']):.4f} "
                    f"kl {float(stats['kl']):.4f} lr {float(stats['lr']):.2e} "
                    f"({steps_per_iter / dt_iter:,.0f} env-steps/s)"
                )
            if self.log_dir and it % self.cfg.runner.save_interval == 0:
                self.save(it)
            if stop["flag"]:
                print(f"signal received — checkpointing at iter {it} and "
                      "exiting")
                break
        for s, h in prev_handlers.items():
            signal.signal(s, h)
        if self.log_dir:
            self.save(int(self.ts.iteration))
        total = iters_run * steps_per_iter  # iterations actually run
        wall = time.time() - t_start
        print(f"total: {total:,} env-steps in {wall:.1f}s "
              f"({total / max(wall, 1e-9):,.0f} env-steps/s)")
        return self.ts


def get_load_path(root: str, load_run=-1, checkpoint=-1) -> str:
    """Latest-run / latest-checkpoint resolution (envs/helpers.py:20-42)."""
    runs = sorted(os.listdir(root))
    if "exported" in runs:
        runs.remove("exported")
    if not runs:
        raise ValueError("No runs in this directory: " + root)
    if load_run == -1:
        # newest run that actually contains a checkpoint (robustness over the
        # reference, which blindly takes the newest dir)
        candidates = [
            os.path.join(root, r)
            for r in reversed(runs)
            if os.path.isdir(os.path.join(root, r))
            and any("model" in f for f in os.listdir(os.path.join(root, r)))
        ]
        if not candidates:
            raise ValueError("No checkpoints under: " + root)
        load_run = candidates[0]
    else:
        load_run = os.path.join(root, load_run)
    if checkpoint == -1:
        models = [f for f in os.listdir(load_run) if "model" in f]
        models.sort(key=lambda m: "{0:0>15}".format(m))
        model = models[-1]
    else:
        model = f"model_{checkpoint}"
    return os.path.join(load_run, model)
