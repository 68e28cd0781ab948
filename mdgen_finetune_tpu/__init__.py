"""TPU-native MD trajectory generation framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of MDGen + RTB
fine-tuning (reference: lucascimeca/mdgen_finetune): torsion + rigid-frame
trajectory tokenization, an SiT-style latent denoiser with factorized
frame x residue attention, GVP flow matching, four conditioning tasks
(forward simulation, transition-path sampling, upsampling, inpainting/design),
MSM/TICA physics evaluation, and a GFlowNet/RTB posterior fine-tuning stack.
"""

__version__ = "0.1.0"
