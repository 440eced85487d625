"""Agent package: on-device rollout drivers and exploration schedules."""

from xingtian_tpu.agents.rollout import EpisodeStats, Trajectory, rollout

__all__ = ["EpisodeStats", "Trajectory", "rollout"]
