"""Command-line entry points (the reference's script surface, TPU-native)."""
