"""Experiment drivers — capability parity with the reference's assign1/2/3
modules, parameterized and runnable on synthetic data (the reference's real
sequences are unhydrated git-LFS pointers).

* color        — YUV420 -> RGB conversion, chroma upsampling, noise-mask
                 visualization grid (reference assign1/ex1.py)
* block_average— Y extraction + block-average "codec" + PSNR/SSIM vs block
                 size study (reference assign1/ex2.py)
* pipeline_run — the encode -> plot -> decode triad every driver wires up
                 (reference assign1/ex3.py, ex4.py, assign2/FastME.py, ...)
* rd_sweep     — block x QP x I_Period RD experiment writing
                 results/rd_experiment_results.csv (reference assign1/ex4_plots.py)
* ablation     — feature-ablation RD study: base vs nRefFrames=4 vs fracME vs
                 fastME vs all (reference assign2/Deliverable.py)
* rc_study     — rate-control deliverable run, lookup-table calibration and
                 RC-mode x bitrate comparison (reference assign3/*)
* data         — synthetic stand-ins for the bundled sequences
"""

from .pipeline_run import encode_plot_decode

__all__ = ["encode_plot_decode"]
