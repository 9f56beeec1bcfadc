"""Example STARKs — ports of the reference model zoo (SURVEY.md section 2.3),
each with its independent control-value oracle, usable as library functions
and runnable as scripts."""
