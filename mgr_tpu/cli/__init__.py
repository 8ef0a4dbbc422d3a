"""Non-interactive command-line entry points."""
