"""Real-SMAC (StarCraft II) adapter + host episodic collector for QMIX/SCC.

Capability parity with the reference's ``StarCraft2Xt``
(``xt/environment/ma/env_starcraft.py:29-77``): wrap ``smac.env.
StarCraft2Env`` behind the same probe surface (``get_env_info`` /
``get_obs`` / ``get_state`` / ``get_avail_actions`` / ``step(actions)``),
import-guarded so the framework loads without StarCraft installed.

Where the reference streams SC2 episodes through explorer processes into
the learner's plasma queue, here :func:`collect_episodes` rolls complete
padded episodes on the host (batched greedy/ε-greedy inference on device)
and :meth:`~xingtian_tpu.algos.qmix.QMIX.train_step_from_episodes`
consumes them as one jitted learner update — the on-device
``StarCraftSkirmish`` analog remains the fast path; this is the
real-simulator path.

A deterministic :class:`FakeSMAC` backend proves the adapter and the
whole host-episodic QMIX loop in tests; real SMAC runs the identical
code path.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from xingtian_tpu.registry import Registers


class SMACBackend:
    """Minimal surface of ``smac.env.StarCraft2Env`` the adapter uses."""

    def reset(self):
        raise NotImplementedError

    def step(self, actions):
        """→ (team_reward, done, info)."""
        raise NotImplementedError

    def get_obs(self):
        raise NotImplementedError           # list of [obs_dim] per agent

    def get_state(self):
        raise NotImplementedError           # [state_dim]

    def get_avail_actions(self):
        raise NotImplementedError           # [n_agents, n_actions]

    def get_env_info(self) -> Dict:
        raise NotImplementedError

    def close(self):
        pass


class FakeSMAC(SMACBackend):
    """Synthetic 2-agent micro-combat backend (test stand-in for SC2).

    Deterministic given the seed; exposes the exact smac info dict keys
    (n_agents/n_actions/obs_shape/state_shape/episode_limit) and masks
    action 1 for dead-ish agents so avail-action handling is exercised.
    """

    def __init__(self, n_agents: int = 2, n_actions: int = 5,
                 obs_dim: int = 8, state_dim: int = 6,
                 episode_limit: int = 12, seed: int = 0,
                 map_name: Optional[str] = None):
        del map_name   # accepted so a real-SC2 config runs on the stub
                       # by flipping ONLY env_info.backend
        self.n_agents, self.n_actions = n_agents, n_actions
        self.obs_dim, self.state_dim = obs_dim, state_dim
        self.episode_limit = episode_limit
        self._rng = np.random.RandomState(seed)
        self._t = 0
        self._hp = None

    def reset(self):
        self._t = 0
        self._hp = np.full((self.n_agents,), 3, np.int32)

    def step(self, actions):
        self._t += 1
        hits = sum(1 for a in actions if int(a) == 2)
        if self._rng.uniform() < 0.3:
            self._hp[self._rng.randint(self.n_agents)] -= 1
        won = hits >= self.n_agents and self._t >= 3
        dead = bool((self._hp <= 0).any())
        done = won or dead or self._t >= self.episode_limit
        reward = 1.0 * hits + (10.0 if won else 0.0)
        return reward, done, {"battle_won": won}

    def get_obs(self):
        base = np.linspace(0, 1, self.obs_dim, dtype=np.float32)
        return [base * (i + 1) + 0.01 * self._t for i in range(self.n_agents)]

    def get_state(self):
        s = np.zeros((self.state_dim,), np.float32)
        s[0] = self._t / self.episode_limit
        s[1:1 + self.n_agents] = self._hp / 3.0
        return s

    def get_avail_actions(self):
        avail = np.ones((self.n_agents, self.n_actions), np.int64)
        avail[self._hp <= 1, 1] = 0     # wounded agents cannot "move north"
        return avail

    def get_env_info(self):
        return {"n_agents": self.n_agents, "n_actions": self.n_actions,
                "obs_shape": self.obs_dim, "state_shape": self.state_dim,
                "episode_limit": self.episode_limit}


def _make_real_backend(**smac_kwargs) -> SMACBackend:
    try:
        from smac.env import StarCraft2Env
    except ImportError as e:
        raise ImportError(
            "smac is not installed; pip install smac (and StarCraft II) "
            "or use backend='fake' for the stub") from e
    return StarCraft2Env(**smac_kwargs)


@Registers.env.register(name="StarCraft2Xt", aliases=("SMAC",))
class StarCraft2Xt:
    """Reference-surface SMAC wrapper (``env_starcraft.py:29-77``).

    ``backend='fake'`` selects :class:`FakeSMAC`; anything else builds the
    real ``StarCraft2Env`` with the remaining kwargs (``map_name=...``).
    """

    api_type = "unified"

    def __init__(self, backend: str = "real", agent_num: Optional[int] = None,
                 **smac_kwargs):
        del agent_num   # reference pops it too (env_starcraft.py:38-40)
        if backend == "fake":
            self.env = FakeSMAC(**smac_kwargs)
        else:
            self.env = _make_real_backend(**smac_kwargs)

    # -- reference surface ------------------------------------------------
    def reset(self):
        self.env.reset()
        return None

    def step(self, action, agent_index=0):
        del agent_index
        return self.env.step(action)

    def get_obs(self):
        return self.env.get_obs()

    def get_state(self):
        return self.env.get_state()

    def get_avail_actions(self):
        return self.env.get_avail_actions()

    def get_env_info(self):
        self.reset()
        info = dict(self.env.get_env_info())
        info.update(api_type=self.api_type, agent_ids=[0])
        return info

    def close(self):
        self.env.close()


def collect_episodes(env: StarCraft2Xt, act_fn, n_episodes: int,
                     seed: int = 0) -> Dict[str, np.ndarray]:
    """Roll ``n_episodes`` full padded episodes from a host SMAC env.

    ``act_fn(obs [A, obs_dim], avail [A, n_actions], h, last_action, t)
    -> (actions [A], h')`` — typically a jitted ε-greedy over the QMIX
    agent net with its GRU hidden state threaded through.

    Returns the exact episode-batch schema QMIX's on-device ring stores
    (obs/gstate/avail [E, T+1, ...]; action/reward/terminated/filled
    [E, T(, A)]) so the batches drop straight into
    :meth:`QMIX.train_step_from_episodes`.
    """
    info = env.get_env_info()
    A, nact = info["n_agents"], info["n_actions"]
    T = info["episode_limit"]
    obs_dim = int(np.prod(info["obs_shape"]))
    state_dim = int(np.prod(info["state_shape"]))

    E = n_episodes
    out = {
        "obs": np.zeros((E, T + 1, A, obs_dim), np.float32),
        "gstate": np.zeros((E, T + 1, state_dim), np.float32),
        "avail": np.zeros((E, T + 1, A, nact), np.float32),
        "action": np.zeros((E, T, A), np.int32),
        "reward": np.zeros((E, T), np.float32),
        "terminated": np.zeros((E, T), np.float32),
        "filled": np.zeros((E, T), np.float32),
    }
    won = 0
    for e in range(E):
        env.reset()
        h = None
        last_a = np.zeros((A,), np.int32)
        for t in range(T):
            obs = np.stack(env.get_obs()).reshape(A, obs_dim)
            gstate = np.asarray(env.get_state(), np.float32).reshape(-1)
            avail = np.asarray(env.get_avail_actions(), np.float32)
            out["obs"][e, t] = obs
            out["gstate"][e, t] = gstate
            out["avail"][e, t] = avail

            actions, h = act_fn(obs, avail, h, last_a, t)
            actions = np.asarray(actions, np.int32).reshape(A)
            reward, done, step_info = env.step(actions)

            out["action"][e, t] = actions
            out["reward"][e, t] = reward
            out["terminated"][e, t] = float(done)
            out["filled"][e, t] = 1.0
            last_a = actions
            if done:
                won += int(bool(step_info.get("battle_won", False)))
                break
        # final (bootstrap) slot
        t_final = min(t + 1, T)
        out["obs"][e, t_final] = np.stack(env.get_obs()).reshape(A, obs_dim)
        out["gstate"][e, t_final] = np.asarray(
            env.get_state(), np.float32).reshape(-1)
        out["avail"][e, t_final] = np.asarray(
            env.get_avail_actions(), np.float32)
    out["battle_won_rate"] = np.float32(won / max(E, 1))
    return out


def collect_episodes_parallel(envs, act_fns, n_episodes: int,
                              seed: int = 0) -> Dict[str, np.ndarray]:
    """Parallel episodic collection: ``len(envs)`` unified adapters in
    worker threads, episodes merged into one padded batch.

    The reference runs ``env_num`` StarCraft explorer *processes* in
    parallel (``xt/framework/broker.py:478-505``); here worker threads
    each own an env + their own ``act_fn`` (jitted device inference
    overlaps other workers' env stepping — SC2/backend step time is the
    bottleneck, and the GIL is released in both the sim and XLA).  Workers
    write disjoint episode slices of the preallocated batch, so no merge
    pass or locking is needed.

    ``act_fns`` must be one per env (each carries its own exploration RNG
    — a shared numpy RandomState is not thread-safe).  Output schema is
    identical to :func:`collect_episodes`.
    """
    import threading

    W = len(envs)
    assert len(act_fns) == W, "one act_fn per env worker"
    if W == 1:
        return collect_episodes(envs[0], act_fns[0], n_episodes, seed)

    info = envs[0].get_env_info()
    A, nact = info["n_agents"], info["n_actions"]
    T = info["episode_limit"]
    obs_dim = int(np.prod(info["obs_shape"]))
    state_dim = int(np.prod(info["state_shape"]))

    E = n_episodes
    out = {
        "obs": np.zeros((E, T + 1, A, obs_dim), np.float32),
        "gstate": np.zeros((E, T + 1, state_dim), np.float32),
        "avail": np.zeros((E, T + 1, A, nact), np.float32),
        "action": np.zeros((E, T, A), np.int32),
        "reward": np.zeros((E, T), np.float32),
        "terminated": np.zeros((E, T), np.float32),
        "filled": np.zeros((E, T), np.float32),
    }
    won = [0] * W
    errors: list = []

    def run_worker(w: int) -> None:
        try:
            env, act_fn = envs[w], act_fns[w]
            for e in range(w, E, W):       # disjoint episode slices
                env.reset()
                h = None
                last_a = np.zeros((A,), np.int32)
                for t in range(T):
                    obs = np.stack(env.get_obs()).reshape(A, obs_dim)
                    out["obs"][e, t] = obs
                    out["gstate"][e, t] = np.asarray(
                        env.get_state(), np.float32).reshape(-1)
                    avail = np.asarray(env.get_avail_actions(), np.float32)
                    out["avail"][e, t] = avail

                    actions, h = act_fn(obs, avail, h, last_a, t)
                    actions = np.asarray(actions, np.int32).reshape(A)
                    reward, done, step_info = env.step(actions)

                    out["action"][e, t] = actions
                    out["reward"][e, t] = reward
                    out["terminated"][e, t] = float(done)
                    out["filled"][e, t] = 1.0
                    last_a = actions
                    if done:
                        won[w] += int(bool(step_info.get("battle_won",
                                                         False)))
                        break
                t_final = min(t + 1, T)
                out["obs"][e, t_final] = np.stack(
                    env.get_obs()).reshape(A, obs_dim)
                out["gstate"][e, t_final] = np.asarray(
                    env.get_state(), np.float32).reshape(-1)
                out["avail"][e, t_final] = np.asarray(
                    env.get_avail_actions(), np.float32)
        except Exception as exc:  # noqa: BLE001 — surface to the caller
            errors.append((w, exc))

    threads = [threading.Thread(target=run_worker, args=(w,), daemon=True)
               for w in range(W)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    if errors:
        raise RuntimeError(
            f"episodic collection worker(s) failed: {errors}") \
            from errors[0][1]
    out["battle_won_rate"] = np.float32(sum(won) / max(E, 1))
    return out
