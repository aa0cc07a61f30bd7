from .runner import Engine
from .simulator import RetirementMonteCarloSimulator

__all__ = ["Engine", "RetirementMonteCarloSimulator"]
