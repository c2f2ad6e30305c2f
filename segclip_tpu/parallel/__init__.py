"""Device mesh, sharding rules, and differentiable collectives."""
