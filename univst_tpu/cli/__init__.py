"""CLI entry points, flag-for-flag compatible with the reference runners."""
