"""Pure-function compute ops: math, sampling, BSDFs, lights, intersection."""
