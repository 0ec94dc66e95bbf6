"""Training runtime: losses, optimizer, sharded train step, trainer loop."""
