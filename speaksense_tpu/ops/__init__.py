"""Hand-written Pallas TPU kernels for the hot ops (log-mel frontend,
attention variants) plus wrappers around the stock Pallas attention kernels
shipped with jaxlib (flash/splash/paged)."""
