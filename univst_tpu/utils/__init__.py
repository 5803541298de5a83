"""Host-side I/O, seeding, profiling utilities."""
