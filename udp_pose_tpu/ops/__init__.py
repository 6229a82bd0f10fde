"""TPU-native codec & geometry ops (the fidelity-critical core).

Submodules:
  affine   — UDP warp matrices + batched bilinear warp (cv2.warpAffine parity)
  targets  — Gaussian / UDP-offset / RSN multi-kernel target encoders
  blur     — OpenCV-parity separable Gaussian blur (REFLECT_101 borders)
  decode   — heatmap → keypoint decoders (argmax, DARK, UDP offset, RSN)
  flip     — flip-test heatmap alignment (channel swap + width flip)
  boxes    — box ↔ center/scale conversions, letterbox
  nms      — box-IoU NMS and OKS-NMS (batched jnp + host variants)
"""
