"""Device compute: geometry, kernels, variograms, solvers, repair."""
