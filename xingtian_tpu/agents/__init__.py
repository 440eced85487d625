"""Agent package: on-device rollout drivers and the user-extensible
interaction-hook block (``xt/agent/`` analog)."""

from xingtian_tpu.agents.agent import Agent, DefaultAgent, build_agent
from xingtian_tpu.agents.rollout import EpisodeStats, Trajectory, rollout

__all__ = ["Agent", "DefaultAgent", "build_agent",
           "EpisodeStats", "Trajectory", "rollout"]
