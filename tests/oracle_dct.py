"""NumPy/cv2 oracle of the reference DCT-QIM codec with perceptual masks
(reference: src/offmark/embed/dct_encoder.py, extract/dct_decoder.py).
Used only as the golden implementation in tests."""

from __future__ import annotations

import cv2
import numpy as np


def luminance_mask_np(lum, blk=8):
    rows, cols = lum.shape[0] // blk, lum.shape[1] // blk
    mask = np.zeros((rows, cols))
    for i in range(rows):
        for j in range(cols):
            mask[i, j] = cv2.dct(np.ascontiguousarray(lum[i * blk:(i + 1) * blk, j * blk:(j + 1) * blk]))[0][0]
    mask /= 8
    l_min, l_max, f_max = 90, 255, 2
    mean = max(l_min, np.mean(mask))
    f_ref = 1 + (mean - l_min) * (f_max - 1) / (l_max - l_min)
    out = np.empty_like(mask)
    for i in range(rows):
        for j in range(cols):
            v = mask[i, j]
            if v > mean:
                out[i, j] = 1 + (v - mean) / (l_max - mean) * (f_max - f_ref)
            elif v < 15:
                out[i, j] = 1.25
            elif v < 25:
                out[i, j] = 1.125
            else:
                out[i, j] = 1
    return out


def texture_mask_np(lum, blk=8):
    rows, cols = lum.shape[0] // blk, lum.shape[1] // blk
    mask = np.full((rows, cols), 1.0)
    with np.errstate(divide="ignore", invalid="ignore"):
        for i in range(rows):
            for j in range(cols):
                c = np.abs(cv2.dct(np.ascontiguousarray(lum[i * blk:(i + 1) * blk, j * blk:(j + 1) * blk])))
                dcl = c[0][0] + c[0][1] + c[0][2] + c[1][0] + c[1][1] + c[2][0]
                eh = np.sum(c) - dcl
                if eh > 125:
                    e = (c[3][0] + c[4][0] + c[5][0] + c[6][0]
                         + c[0][3] + c[0][4] + c[0][5] + c[0][6]
                         + c[2][1] + c[1][2] + c[2][2] + c[3][3])
                    h = eh - e
                    l = dcl - c[0][0]
                    a1, b1 = 2.3, 1.6
                    a2, b2 = 1.4, 1.1
                    l_e, le_h = l / e, (l + e) / h
                    if eh > 900:
                        if (l_e >= a2 and le_h >= b2) or (l_e >= b2 and le_h >= a2) or le_h > 4:
                            mask[i, j] = 1.125 if l + e <= 400 else 1.25
                        else:
                            mask[i, j] = 1 + 1.25 * (eh - 290) / (1800 - 290)
                    else:
                        if (l_e >= a1 and le_h >= b1) or (l_e >= b1 and le_h >= a1) or le_h > 4:
                            mask[i, j] = 1.125 if l + e <= 400 else 1.25
                        elif e + h > 290:
                            mask[i, j] = 1 + 1.25 * (eh - 290) / (1800 - 290)
    return mask


def encode_yuv_np(yuv, wm_flat, alpha=20, blk=8):
    yuv = yuv.copy()
    channel = yuv[:, :, 1]
    mask = texture_mask_np(yuv[:, :, 0]) * luminance_mask_np(yuv[:, :, 0])
    c = 0
    for i in range(channel.shape[0] // blk):
        for j in range(channel.shape[1] // blk):
            b = np.ascontiguousarray(channel[i * blk:(i + 1) * blk, j * blk:(j + 1) * blk])
            coeffs = cv2.dct(b)
            step = alpha * mask[i][j]
            step2 = step + step
            v = coeffs[2][1]
            if wm_flat[c] == 0:
                coeffs[2][1] = np.sign(v) * np.floor(abs(v) / step2) * step2
            else:
                coeffs[2][1] = np.sign(v) * (np.floor(abs(v) / step2) * step2 + step)
            channel[i * blk:(i + 1) * blk, j * blk:(j + 1) * blk] = cv2.idct(coeffs)
            c += 1
    return yuv


def decode_yuv_np(yuv, alpha=20, blk=8):
    channel = yuv[:, :, 1]
    mask = texture_mask_np(yuv[:, :, 0]) * luminance_mask_np(yuv[:, :, 0])
    out = np.zeros(yuv.shape[0] * yuv.shape[1] // blk // blk)
    c = 0
    for i in range(channel.shape[0] // blk):
        for j in range(channel.shape[1] // blk):
            b = np.ascontiguousarray(channel[i * blk:(i + 1) * blk, j * blk:(j + 1) * blk])
            coeffs = cv2.dct(b)
            step = alpha * mask[i][j]
            out[c] = int(np.around(coeffs[2][1] / step) % 2 == 1)
            c += 1
    return out
