#!/usr/bin/env python
"""Randomized VCM partition-unity sweep: generalize tools/partition_check.py
to arbitrary path lengths, random geometry, and a range of eta_vcm.
For each random path x0(camera)..xk(light), all diffuse interiors, compute
the CODE's weight for every technique (replayed recursions) and report the
sum. A consistent partition sums to 1 for every path.

Run: python tools/partition_sweep.py
"""

import numpy as np

PI = np.pi
rng = np.random.default_rng(0)


def nrm(v):
    return v / np.linalg.norm(v)


def run_path(k, eta, plane_area, pdf0, verbose=False):
    """k = number of segments (k+1 vertices, x0=camera, xk=light)."""
    # random positions in a box; random normals oriented to face the
    # incoming segment (diffuse surfaces see both path neighbors above)
    while True:
        xs = [rng.uniform(-1, 1, 3) for _ in range(k + 1)]
        ns = []
        ok = True
        for i in range(1, k + 1):
            nn = nrm(rng.normal(size=3))
            prv, cur = xs[i - 1], xs[i]
            if np.dot(nn, prv - cur) < 0:
                nn = -nn
            ns.append(nn)
            if i < k:
                # require the outgoing neighbor on the same side
                pass
        # validity: each interior vertex must see both neighbors from the
        # front (diffuse reflection), light must see x_{k-1} from front
        for i in range(1, k):
            if (np.dot(ns[i - 1], xs[i - 1] - xs[i]) <= 1e-3
                    or np.dot(ns[i - 1], xs[i + 1] - xs[i]) <= 1e-3):
                ok = False
        if np.dot(ns[k - 1], xs[k - 1] - xs[k]) <= 1e-3:
            ok = False
        if ok:
            break
    cam_fwd = nrm(xs[1] - xs[0] + rng.normal(size=3) * 0.1)

    x0 = xs[0]

    def cos_at(n, a, b):
        return abs(np.dot(n, nrm(b - a)))

    def d2(a, b):
        return np.dot(b - a, b - a)

    def cam_pdf_area(x, nx):
        co = abs(np.dot(cam_fwd, nrm(x - x0)))
        return (1.0 / (plane_area * co ** 3)) * cos_at(nx, x, x0) / d2(x0, x)

    def dsa(nfrom, a, b):
        return cos_at(nfrom, a, b) / PI

    def darea(nfrom, nto, a, b):
        return dsa(nfrom, a, b) * cos_at(nto, b, a) / d2(a, b)

    nl = ns[k - 1]  # light normal (use last); emission cosine about it

    def advance(prev, pfa, g, rev_prev):
        d_vcm = 1.0 / pfa
        d_vc = (g / pfa) * (eta + prev[0] + rev_prev * prev[1])
        d_vm = (g / pfa) * (1.0 + prev[0] / eta + rev_prev * prev[2])
        return (d_vcm, d_vc, d_vm)

    # ---- eye walk states e[i] at vertex xs[i], i=1..k
    e = {}
    e[1] = (1.0 / cam_pdf_area(xs[1], ns[0]), 0.0, 0.0)
    for i in range(2, k + 1):
        pfa = darea(ns[i - 2], ns[i - 1], xs[i - 1], xs[i])
        g = cos_at(ns[i - 2], xs[i - 1], xs[i]) / d2(xs[i - 1], xs[i])
        rev_prev = dsa(ns[i - 2], xs[i - 1], xs[i - 2] if i > 2 else x0)
        e[i] = advance(e[i - 1], pfa, g, rev_prev)

    # ---- light walk states l[j] at vertex xs[k-j], j=1..k-1
    ln = {k: None}
    pe = darea(nl, ns[k - 2], xs[k], xs[k - 1]) if k >= 2 else None
    l = {}
    if k >= 2:
        g0 = cos_at(nl, xs[k], xs[k - 1]) / d2(xs[k], xs[k - 1])
        l[1] = (1.0 / pe, (1.0 / pdf0) * g0 / pe,
                (1.0 / pdf0) * g0 / pe / eta)
        for j in range(2, k):
            a, b = xs[k - j + 1], xs[k - j]     # from -> to
            na, nb = ns[k - j], ns[k - j - 1]
            pfa = darea(na, nb, a, b)
            g = cos_at(na, a, b) / d2(a, b)
            rev_prev = dsa(na, a, xs[k - j + 2] if j > 2 else xs[k])
            l[j] = advance(l[j - 1], pfa, g, rev_prev)

    code = {}

    # naive at xk (eye reaches light); prev (x_{k-1}) not delta
    cos_l = cos_at(nl, xs[k], xs[k - 1])
    w_eye = pdf0 * e[k][0] + pdf0 * (cos_l / PI) * e[k][1]
    code["naive"] = 1.0 / (1.0 + w_eye)

    # NEE at x_{k-1}
    if k >= 2:
        pdf_bsdf_area = darea(ns[k - 2], nl, xs[k - 1], xs[k])
        ratio = pdf_bsdf_area / pdf0
        w_light = ratio * ratio
        pcra = darea(nl, ns[k - 2], xs[k], xs[k - 1])  # emit pdf at x_{k-1}
        prev = xs[k - 2] if k > 2 else x0
        pprs = dsa(ns[k - 2], xs[k - 1], prev)
        w_eye = pcra * (eta + e[k - 1][0] + pprs * e[k - 1][1])
        code["nee"] = 1.0 / (1.0 + w_light + w_eye)

    # connections: eye x_t <-> light x_{t+1}, t=1..k-2
    for t in range(1, k - 1):
        s = k - t - 1               # light walk depth of the light vertex
        et, ls = e[t], l[s]
        a, b = xs[t], xs[t + 1]     # eye vtx, light vtx
        na, nb = ns[t - 1], ns[t]
        eprev = xs[t - 1] if t > 1 else x0
        lprev = xs[t + 2]
        pdf_eye_rev_area = darea(nb, na, b, a)
        pdf_bef_eye_rev = dsa(na, a, eprev)
        pdf_light_rev_area = darea(na, nb, a, b)
        pdf_bef_light_rev = dsa(nb, b, lprev)
        w_eye = pdf_eye_rev_area * (eta + et[0] + pdf_bef_eye_rev * et[1])
        w_light = pdf_light_rev_area * (eta + ls[0] + pdf_bef_light_rev * ls[1])
        code[f"conn{t}"] = 1.0 / (1.0 + w_eye + w_light)

    # splat at x1 (light walk depth k-1)
    if k >= 2:
        lk = l[k - 1]
        pcra = cam_pdf_area(xs[1], ns[0])
        prs = dsa(ns[0], xs[1], xs[2])
        w_light = pcra * (eta + lk[0] + prs * lk[1])
        code["splat"] = 1.0 / (1.0 + w_light)

    # merges at x_i, i=1..k-1 (eye state e[i], photon = light state l[k-i])
    for i in range(1, k):
        ei, li = e[i], l[k - i]
        eprev = xs[i - 1] if i > 1 else x0
        pdf_eye_rev = dsa(ns[i - 1], xs[i], eprev)
        pdf_light_rev = dsa(ns[i - 1], xs[i], xs[i + 1])
        w_eye = ei[0] / eta + pdf_eye_rev * ei[2]
        w_light = li[0] / eta + pdf_light_rev * li[2]
        code[f"merge{i}"] = 1.0 / (1.0 + w_eye + w_light)

    tot = sum(code.values())
    if verbose:
        for kk, v in code.items():
            print(f"  {kk:<8} {v:.5f}")
    return tot


def main():
    plane_area = 4.0 * (2.0 / 1.5)
    pdf0 = 4.0
    for eta in (0.1, 0.9, 4.0, 20.0):
        for k in (2, 3, 4, 5):
            sums = [run_path(k, eta, plane_area, pdf0) for _ in range(200)]
            sums = np.array(sums)
            print(f"eta={eta:<5} k={k}: sum mean {sums.mean():.4f} "
                  f"min {sums.min():.4f} max {sums.max():.4f}")


if __name__ == "__main__":
    main()
