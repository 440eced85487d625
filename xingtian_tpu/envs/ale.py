"""Real-simulator Atari adapter for the host env farm.

Drives the actual Arcade Learning Environment (when ``ale_py`` or
``gymnasium[atari]`` is installed) behind
:class:`~xingtian_tpu.envs.host.HostEnvProtocol`, reproducing the
reference's full preprocessing stack as pure numpy:

* noop reset — 1..30 random noops after every game reset
  (``xt/environment/gym/atari_wrappers.py:26-50``);
* action repeat ×4 with a pixel-max over the last two raw frames
  (``atari_wrappers.py:52-68``);
* life-loss episodic done with ``real_done`` tracked separately: losing a
  life ends the learning episode but the game continues (no reset) until
  game over (``atari_wrappers.py:71-103``);
* fire reset for games whose action set contains FIRE
  (``atari_wrappers.py:106-119``);
* grayscale luma → 84×84 area resize → 4-frame uint8 stack, with the
  stack cleared to zeros on episode boundaries
  (``xt/environment/gym/atari_env.py:33-103``).

The sim backend is injected through a tiny ``AtariCore`` seam so the
adapter's preprocessing is fully testable without ALE in the image:
``FakeAtariCore`` emits deterministic synthetic frames/lives and the test
suite trains IMPALA end-to-end through the farm against it — against real
ALE the identical code path runs, only the core differs.

Usage from YAML (the reference deployment shape)::

    env_para:
      env_name: HostFarm
      env_info: {name: ALE, game: BreakoutNoFrameskip-v4}
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from xingtian_tpu.envs.host import HostEnvProtocol
from xingtian_tpu.registry import Registers


# ---------------------------------------------------------------------------
# Sim-backend seam
# ---------------------------------------------------------------------------

class AtariCore:
    """Minimal raw-emulator surface the adapter needs."""

    n_actions: int = 0
    action_meanings: Tuple[str, ...] = ()

    def reset(self, seed: Optional[int] = None) -> np.ndarray:
        """→ raw RGB frame [H, W, 3] uint8."""
        raise NotImplementedError

    def step(self, action: int) -> Tuple[np.ndarray, float, bool]:
        """→ (raw RGB frame, reward, game_over)."""
        raise NotImplementedError

    def lives(self) -> int:
        raise NotImplementedError


def _make_real_core(game: str) -> AtariCore:
    """Try ale_py, then gymnasium, then gym; raise ImportError otherwise."""
    try:
        import ale_py  # noqa: F401
        return _AlePyCore(game)
    except ImportError:
        pass
    for mod in ("gymnasium", "gym"):
        try:
            return _GymCore(game, __import__(mod))
        except ImportError:
            continue
    raise ImportError(
        "no Atari backend available: install ale_py or gymnasium[atari] "
        "(or pass a core= explicitly / use name: FakeALE for the stub)")


class _AlePyCore(AtariCore):
    """Direct ALEInterface backend (no gym layer at all)."""

    def __init__(self, game: str):
        import ale_py
        self._ale = ale_py.ALEInterface()
        rom = game.replace("NoFrameskip", "").replace("Deterministic", "")
        rom = rom.split("-v")[0]
        self._ale.loadROM(getattr(ale_py.roms, rom))
        self._actions = self._ale.getMinimalActionSet()
        self.n_actions = len(self._actions)
        # ALE action ids → meaning strings for the FIRE probe
        import ale_py as _a
        self.action_meanings = tuple(
            _a.Action(a).name for a in self._actions)

    def reset(self, seed=None):
        if seed is not None:
            self._ale.setInt("random_seed", int(seed) & 0x7FFFFFFF)
        self._ale.reset_game()
        return self._ale.getScreenRGB()

    def step(self, action):
        r = self._ale.act(self._actions[int(action)])
        return self._ale.getScreenRGB(), float(r), self._ale.game_over()

    def lives(self):
        return self._ale.lives()


class _GymCore(AtariCore):
    """gym/gymnasium NoFrameskip backend (frameskip handled here, not there)."""

    def __init__(self, game: str, gym_mod):
        self._env = gym_mod.make(game)
        self.n_actions = self._env.action_space.n
        self.action_meanings = tuple(self._env.unwrapped.get_action_meanings())

    def reset(self, seed=None):
        if seed is not None:
            try:
                out = self._env.reset(seed=seed)
            except TypeError:
                # legacy gym (<0.22): seed() is a separate call and
                # reset() takes no kwargs
                if hasattr(self._env, "seed"):
                    self._env.seed(seed)
                out = self._env.reset()
        else:
            out = self._env.reset()
        obs = out[0] if isinstance(out, tuple) else out
        return np.asarray(obs, np.uint8)

    def step(self, action):
        out = self._env.step(int(action))
        if len(out) == 5:   # gymnasium: obs, r, terminated, truncated, info
            obs, r, term, trunc, _ = out
            return np.asarray(obs, np.uint8), float(r), bool(term or trunc)
        obs, r, done, _ = out
        return np.asarray(obs, np.uint8), float(r), bool(done)

    def lives(self):
        return self._env.unwrapped.ale.lives()


class FakeAtariCore(AtariCore):
    """Deterministic synthetic emulator for adapter tests (no ALE needed).

    Emits 64×48 RGB frames whose content encodes the internal tick so the
    max-pool / grayscale / resize / stack math is checkable; loses one of
    3 lives every ``life_len`` raw steps; game over when lives hit 0.
    Action 1 is FIRE (exercises the fire-reset branch).
    """

    n_actions = 4
    action_meanings = ("NOOP", "FIRE", "RIGHT", "LEFT")

    def __init__(self, life_len: int = 40, h: int = 48, w: int = 64):
        self.life_len = life_len
        self.h, self.w = h, w
        self._t = 0
        self._lives = 3
        self.raw_steps = 0       # total emulator steps (test observability)

    def _frame(self) -> np.ndarray:
        f = np.zeros((self.h, self.w, 3), np.uint8)
        f[:, :, 0] = self._t % 251                 # tick-dependent red plane
        f[(self._t * 3) % self.h, :, 1] = 255      # moving green scanline
        return f

    def reset(self, seed=None):
        self._t = 0 if seed is None else int(seed) % 7
        self._lives = 3
        return self._frame()

    def step(self, action):
        self._t += 1
        self.raw_steps += 1
        reward = 1.0 if (int(action) == 2 and self._t % 5 == 0) else 0.0
        if self._t % self.life_len == 0:
            self._lives -= 1
        return self._frame(), reward, self._lives <= 0

    def lives(self):
        return self._lives


# ---------------------------------------------------------------------------
# Preprocessing (pure numpy — the wrapper-stack math)
# ---------------------------------------------------------------------------

def rgb_to_gray(frame: np.ndarray) -> np.ndarray:
    """ITU-R BT.601 luma — what cv2.COLOR_RGB2GRAY computes
    (``atari_env.py:99``)."""
    return (frame[..., 0] * 0.299 + frame[..., 1] * 0.587
            + frame[..., 2] * 0.114)


def resize_area(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Area-style downsample (cv2.INTER_AREA analog, ``atari_env.py:100``):
    mean-pool when dims divide evenly, index-map otherwise."""
    h, w = img.shape[:2]
    if h % out_h == 0 and w % out_w == 0:
        return img.reshape(out_h, h // out_h, out_w, w // out_w).mean(
            axis=(1, 3))
    ys = (np.arange(out_h) * (h / out_h)).astype(np.int64)
    xs = (np.arange(out_w) * (w / out_w)).astype(np.int64)
    return img[ys][:, xs]


class AtariPreprocessor:
    """Stateful frame pipeline shared by every core backend."""

    def __init__(self, core: AtariCore, dim: int = 84, n_stack: int = 4,
                 repeat: int = 4, max_noops: int = 30,
                 episodic_life: bool = True, seed: int = 0):
        self.core = core
        self.dim = dim
        self.n_stack = n_stack
        self.repeat = repeat
        self.max_noops = max_noops
        self.episodic_life = episodic_life
        self._rng = np.random.RandomState(seed)
        self._stack = np.zeros((dim, dim, n_stack), np.uint8)
        self._fire = "FIRE" in core.action_meanings
        self._lives = 0
        self._real_done = True

    # -- frame ops ------------------------------------------------------
    def _proc(self, frame: np.ndarray) -> np.ndarray:
        g = resize_area(rgb_to_gray(frame), self.dim, self.dim)
        return np.clip(g, 0, 255).astype(np.uint8)

    def _push(self, frame: np.ndarray) -> None:
        self._stack = np.concatenate(
            [self._stack[..., 1:], self._proc(frame)[..., None]], axis=-1)

    def _clear_stack(self) -> None:
        self._stack = np.zeros_like(self._stack)

    # -- wrapper-stack semantics -----------------------------------------
    def _game_reset(self, seed=None) -> np.ndarray:
        frame = self.core.reset(seed)
        # noop reset (atari_wrappers.py:41-50)
        for _ in range(self._rng.randint(1, self.max_noops + 1)):
            frame, _, over = self.core.step(0)
            if over:
                frame = self.core.reset()
        # fire reset (atari_wrappers.py:106-119)
        if self._fire:
            frame, _, over = self.core.step(1)
            if over:
                frame = self.core.reset()
            frame, _, over = self.core.step(2 % self.core.n_actions)
            if over:
                frame = self.core.reset()
        return frame

    def reset(self, seed=None) -> np.ndarray:
        if self._real_done:
            frame = self._game_reset(seed)
        else:
            # life lost, game still running: continue with a noop
            # (AtariRealDone.reset, atari_wrappers.py:81-89)
            frame, _, over = self.core.step(0)
            if over:
                frame = self._game_reset(seed)
        self._lives = self.core.lives()
        self._real_done = False
        self._clear_stack()
        self._push(frame)
        return self._stack.copy()

    def step(self, action: int) -> Tuple[np.ndarray, float, bool, bool]:
        """→ (stacked obs, summed reward, done, real_done)."""
        total, over = 0.0, False
        f_prev = f_last = None
        for i in range(self.repeat):
            frame, r, over = self.core.step(int(action))
            total += r
            if i == self.repeat - 2:
                f_prev = frame
            if i == self.repeat - 1:
                f_last = frame
            if over:
                f_last = frame
                break
        # pixel max over the last two raw frames (atari_wrappers.py:60-68)
        merged = f_last if f_prev is None else np.maximum(f_prev, f_last)

        self._real_done = over
        done = over
        if self.episodic_life:
            lives = self.core.lives()
            if 0 < lives < self._lives:
                done = True           # learning-episode boundary
            self._lives = lives

        if done:
            self._clear_stack()       # stack reset on boundary (atari_env.py:70-93)
        self._push(merged)
        return self._stack.copy(), total, done, self._real_done


# ---------------------------------------------------------------------------
# HostEnvProtocol adapters (farm-ready, internal auto-reset)
# ---------------------------------------------------------------------------

@Registers.host_env.register(name="ALE", aliases=("AtariALE", "GymAtari"))
class ALEAtari(HostEnvProtocol):
    """Real-ALE host env: 84×84×4 uint8, auto-reset on (episodic) done."""

    # observations are a temporal frame stack (last axis = n_stack), so
    # the farm may use slim pixel transport (newest frame per step +
    # device-side restack) — see AsyncTrajectoryFarm.slim_pixel_frames
    FRAME_STACKED = True

    def __init__(self, game: str = "BreakoutNoFrameskip-v4", dim: int = 84,
                 core: Optional[AtariCore] = None, seed: int = 0, **kw):
        self.core = core if core is not None else _make_real_core(game)
        self.ACTION_DIM = self.core.n_actions
        self.pre = AtariPreprocessor(self.core, dim=dim, seed=seed, **kw)

    def reset(self, seed: int) -> np.ndarray:
        return self.pre.reset(seed)

    def step(self, action) -> Tuple[np.ndarray, float, bool]:
        obs, reward, done, _real_done = self.pre.step(action)
        if done:
            obs = self.pre.reset(None)   # farm protocol: auto-reset obs
        return obs, reward, done


@Registers.host_env.register(name="FakeALE")
class FakeALE(ALEAtari):
    """Stub-backed adapter: identical code path, synthetic emulator."""

    ACTION_DIM = FakeAtariCore.n_actions

    def __init__(self, game: str = "FakeNoFrameskip-v4", dim: int = 84,
                 seed: int = 0, **kw):
        super().__init__(game, dim=dim, core=FakeAtariCore(), seed=seed, **kw)
