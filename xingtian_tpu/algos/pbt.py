"""Population-Based Training — the whole population in one vmapped program.

Capability parity with the reference's PBT (``xt/algorithm/pbt.py``):

* exploit: bottom-fraction members copy weights + hyperparameters from a
  random top-fraction member (``pbt.py:207-259``);
* explore: perturb the copied hypers ×0.8/×1.2 or resample from the
  search space (``pbt.py:264-308``);
* ready-gate by train-step interval (``pbt.py:310-317``);
* metric = recent episode reward (the reference tracks per-member episodic
  reward in a Manager dict; here it is ``ep_stats.recent_return``, already
  on device).

TPU-native inversion: the reference runs ``pbt_size`` learner *processes*,
each with its own explorer set, and exploit builds a whole new algorithm
instance (``pbt.py:299-303``).  Here the population is a **leading vmap
axis** over the algorithm's train state — P members train simultaneously
in one compiled program, and exploit/explore are pure gather/where ops on
the population pytree.  On a mesh, the population axis can be sharded so
each member group lands on its own chips.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


DEFAULT_SEARCH_SPACE = {
    # name: (low, high, log_scale) — filtered per algorithm to the keys it
    # exposes as dynamic hypers (PPO: LR/ENTROPY_LOSS; DQN: LRC;
    # IMPALA: LR/ENTROPY_COEF)
    "LR": (1e-5, 1e-2, True),
    "LRC": (1e-5, 1e-2, True),
    "ENTROPY_LOSS": (1e-4, 3e-2, True),
    "ENTROPY_COEF": (1e-4, 3e-2, True),
}


class PopulationPBT:
    """PBT over any algorithm whose state carries a ``hypers`` dict.

    ``alg`` must expose ``init_state(key, hypers=...)`` and ``train_step``
    (e.g. :class:`~xingtian_tpu.algos.ppo.PPO`).
    """

    def __init__(self, alg, pop_size: int,
                 search_space: Optional[Dict[str, tuple]] = None,
                 exploit_fraction: float = 0.25,
                 perturb_factors: Tuple[float, float] = (0.8, 1.2),
                 resample_prob: float = 0.25,
                 pbt_interval: int = 10):
        self.alg = alg
        self.pop_size = int(pop_size)
        if search_space is None:
            # restrict the defaults to the hypers THIS algorithm actually
            # reads (the table mixes PPO/DQN/IMPALA names)
            dyn = set(alg.default_hypers())
            search_space = {k: v for k, v in DEFAULT_SEARCH_SPACE.items()
                            if k in dyn}
            if not search_space:
                raise ValueError(
                    f"{type(alg).__name__} exposes no hyper from the "
                    f"default search space; pass search_space explicitly")
        self.search_space = dict(search_space)
        self.exploit_fraction = float(exploit_fraction)
        self.perturb_factors = perturb_factors
        self.resample_prob = float(resample_prob)
        self.pbt_interval = int(pbt_interval)   # ready-gate (pbt.py:310-317)
        self._vstep = jax.vmap(alg.train_step)

    # ------------------------------------------------------------------
    def sample_hypers(self, key: Array) -> Dict[str, Array]:
        """One member's hypers: defaults overridden by search-space samples."""
        hypers = dict(self.alg.default_hypers())
        for i, (name, (lo, hi, log)) in enumerate(self.search_space.items()):
            sub = jax.random.fold_in(key, i)
            u = jax.random.uniform(sub, ())
            if log:
                val = jnp.exp(jnp.log(lo) + u * (jnp.log(hi) - jnp.log(lo)))
            else:
                val = lo + u * (hi - lo)
            hypers[name] = val.astype(jnp.float32)
        return hypers

    # ------------------------------------------------------------------
    def init_population(self, key: Array):
        """[P]-leading state pytree with per-member PRNG streams + hypers."""
        keys = jax.random.split(key, self.pop_size)
        hyper_keys = jax.random.split(
            jax.random.fold_in(key, 7919), self.pop_size)
        hypers = jax.vmap(self.sample_hypers)(hyper_keys)
        return jax.vmap(lambda k, h: self.alg.init_state(k, hypers=h))(
            keys, hypers)

    # ------------------------------------------------------------------
    def train_step(self, pop_state):
        """All members advance one fused train step (vmapped)."""
        return self._vstep(pop_state)

    # ------------------------------------------------------------------
    def pbt_step(self, pop_state, key: Array):
        """One exploit/explore round (call every ``pbt_interval`` updates).

        Pure device ops: rank by recent episode reward, bottom members
        gather (params, opt_state, hypers) from random top members, then
        perturb/resample the inherited hypers.
        """
        P = self.pop_size
        n_exploit = max(1, int(P * self.exploit_fraction))
        perf = pop_state.ep_stats.recent_return                    # [P]
        order = jnp.argsort(perf)                                   # ascending
        bottom = order[:n_exploit]
        top = order[P - n_exploit:]

        k_donor, k_perturb, k_resample, k_which = jax.random.split(key, 4)
        donor_choice = top[jax.random.randint(k_donor, (n_exploit,), 0, n_exploit)]

        # donor map: identity except bottom[i] -> donor_choice[i]
        donor_map = jnp.arange(P).at[bottom].set(donor_choice)
        exploited = jnp.zeros((P,), bool).at[bottom].set(True)

        def gather_leaf(leaf):
            return leaf[donor_map]

        def gather(tree):
            return jax.tree_util.tree_map(gather_leaf, tree)

        new_params = gather(pop_state.params)
        new_opt = gather(pop_state.opt_state)
        new_hypers = {k: v[donor_map] for k, v in pop_state.hypers.items()}
        # derived param pytrees follow the exploit too — the reference
        # replaces the whole algorithm instance (pbt.py:299-303), so a DQN
        # member inherits the donor's target net and an IMPALA member the
        # donor's lagged actor params
        derived = {
            f: gather(getattr(pop_state, f))
            for f in ("target_params", "actor_params")
            if f in pop_state.__dataclass_fields__
            and getattr(pop_state, f) is not None
        }

        # explore: per searched hyper, ×0.8 / ×1.2 or resample (pbt.py:264-308)
        for i, (name, (lo, hi, log)) in enumerate(self.search_space.items()):
            f_lo, f_hi = self.perturb_factors
            which = jax.random.bernoulli(
                jax.random.fold_in(k_which, i), 0.5, (P,))
            factor = jnp.where(which, f_hi, f_lo)
            perturbed = jnp.clip(new_hypers[name] * factor, lo, hi)
            u = jax.random.uniform(jax.random.fold_in(k_resample, i), (P,))
            if log:
                resampled = jnp.exp(
                    jnp.log(lo) + u * (jnp.log(hi) - jnp.log(lo)))
            else:
                resampled = lo + u * (hi - lo)
            do_resample = jax.random.bernoulli(
                jax.random.fold_in(k_perturb, i), self.resample_prob, (P,))
            explored = jnp.where(do_resample, resampled, perturbed)
            new_hypers[name] = jnp.where(
                exploited, explored, new_hypers[name]).astype(jnp.float32)

        # exploited members also inherit the donor's episode-reward EMA so
        # they are not instantly re-exploited while their stats warm up
        new_ep = pop_state.ep_stats.replace(
            recent_return=pop_state.ep_stats.recent_return[donor_map],
            recent_len=pop_state.ep_stats.recent_len[donor_map],
        )
        return pop_state.replace(
            params=new_params, opt_state=new_opt, hypers=new_hypers,
            ep_stats=new_ep, **derived,
        ), {"exploited": exploited, "donor_map": donor_map, "perf": perf}

    # ------------------------------------------------------------------
    def best_member(self, pop_state) -> int:
        return int(jnp.argmax(pop_state.ep_stats.recent_return))

    def member_state(self, pop_state, i: int):
        return jax.tree_util.tree_map(lambda x: x[i], pop_state)
