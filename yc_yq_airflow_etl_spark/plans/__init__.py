"""Query plans: the reference's three YQL queries re-expressed as
DataFrame programs, the cooling pipeline driver, and the analytics
query library used for correctness/bench coverage."""
