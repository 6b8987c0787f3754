import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
from bench_scale import bench_n2
bench_n2(n=2_000_000, dups=8_000)
bench_n2(n=10_000_000, dups=40_000)
