"""Loop-based oracle implementation of the Jacobian assembly.

A direct per-cell transcription of the reference algorithm (specified by
/root/reference/src/matrix.c) used ONLY as a test oracle: the production
code in nk_ocn_tracer_jacobian_precond_tpu/ops is vectorized and
structurally different; agreement between the two independent
implementations (exact sparsity pattern, near-bit-exact values) validates
both. Runs on tiny grids only — it is deliberately slow and simple.
"""

from __future__ import annotations

import numpy as np

from nk_ocn_tracer_jacobian_precond_tpu.ops.adv import vertical_upwind3_weights
from nk_ocn_tracer_jacobian_precond_tpu.ops.options import (
    COUPLED_TRACER_NAMES,
    AssemblyOptions,
)


class RefAssembler:
    def __init__(self, grid, opts: AssemblyOptions, circ_src, tracer_src=None):
        self.g = grid
        self.opts = opts
        self.circ = circ_src
        self.tracer = tracer_src
        self.km, self.jmt, self.imt = grid.km, grid.jmt, grid.imt
        self.KMT = np.asarray(grid.KMT)
        self.KMU = np.asarray(grid.KMU)
        self.dz = np.asarray(grid.dz)
        self.z_t = np.asarray(grid.z_t)
        self.TAREA = np.asarray(grid.TAREA)
        self.dt = opts.delta_t
        self.yc = opts.year_cnt
        self.nt = opts.coupled_tracer_cnt
        self._gen_ind_maps()
        self._init_matrix()

    # -- index helpers -----------------------------------------------------

    def _nbrs(self, i):
        imt = self.imt
        ip1 = i + 1 if i < imt - 1 else 0
        im1 = i - 1 if i > 0 else imt - 1
        ip2 = ip1 + 1 if ip1 < imt - 1 else 0
        im2 = im1 - 1 if im1 > 0 else imt - 1
        return ip1, im1, ip2, im2

    def _gen_ind_maps(self):
        km, jmt, imt = self.km, self.jmt, self.imt
        self.int3 = -np.ones((km, jmt, imt), dtype=np.int64)
        self.cells = []
        ind = 0
        for j in range(jmt):
            for i in range(imt):
                for k in range(km):
                    if k < self.KMT[j, i]:
                        self.int3[k, j, i] = ind
                        self.cells.append((i, j, k))
                        ind += 1
        self.tsl = ind

    # -- pattern (init_matrix) --------------------------------------------

    def _row_slots(self, t, i, j, k):
        """Build the ordered slot list for one row; returns (cols, cat_pos)
        where cat_pos maps category name -> starting slot index."""
        KMT = self.KMT
        km, jmt = self.km, self.jmt
        ip1, im1, ip2, im2 = self._nbrs(i)
        base = t * self.tsl
        cols = []
        pos = {}
        pos["self"] = len(cols)
        cols.append(base + self.int3[k, j, i])
        if k - 1 >= 0:
            cols.append(base + self.int3[k - 1, j, i])
        if k + 1 < KMT[j, i]:
            cols.append(base + self.int3[k + 1, j, i])
        if k < KMT[j, ip1]:
            cols.append(base + self.int3[k, j, ip1])
        if k < KMT[j, im1]:
            cols.append(base + self.int3[k, j, im1])
        if k < KMT[j + 1, i]:
            cols.append(base + self.int3[k, j + 1, i])
        if k < KMT[j - 1, i]:
            cols.append(base + self.int3[k, j - 1, i])
        pos["adv_non_nbr"] = len(cols)
        if self.opts.adv_type == "upwind3":
            if k - 2 >= 0:
                cols.append(base + self.int3[k - 2, j, i])
            if k + 2 < KMT[j, i]:
                cols.append(base + self.int3[k + 2, j, i])
            if k < KMT[j, ip2]:
                cols.append(base + self.int3[k, j, ip2])
            if k < KMT[j, im2]:
                cols.append(base + self.int3[k, j, im2])
            if j + 2 < jmt and k < KMT[j + 2, i]:
                cols.append(base + self.int3[k, j + 2, i])
            if j - 2 >= 0 and k < KMT[j - 2, i]:
                cols.append(base + self.int3[k, j - 2, i])
        pos["hmix_non_nbr"] = len(cols)
        if self.opts.hmix_type == "isop_file":
            if k - 1 >= 0 and k - 1 < KMT[j, ip1]:
                cols.append(base + self.int3[k - 1, j, ip1])
            if k + 1 < KMT[j, ip1]:
                cols.append(base + self.int3[k + 1, j, ip1])
            if k - 1 >= 0 and k - 1 < KMT[j, im1]:
                cols.append(base + self.int3[k - 1, j, im1])
            if k + 1 < KMT[j, im1]:
                cols.append(base + self.int3[k + 1, j, im1])
            if k - 1 >= 0 and k - 1 < KMT[j + 1, i]:
                cols.append(base + self.int3[k - 1, j + 1, i])
            if k + 1 < KMT[j + 1, i]:
                cols.append(base + self.int3[k + 1, j + 1, i])
            if k - 1 >= 0 and k - 1 < KMT[j - 1, i]:
                cols.append(base + self.int3[k - 1, j - 1, i])
            if k + 1 < KMT[j - 1, i]:
                cols.append(base + self.int3[k + 1, j - 1, i])
        pos["vmix_non_nbr"] = len(cols)
        if self.opts.vmix_type == "matrix_file":
            for k2 in range(KMT[j, i]):
                cols.append(base + self.int3[k2, j, i])
        pos["sink_non_nbr"] = len(cols)
        pt = self.opts.per_tracer[t]
        if pt.sink_type == "generic_tracer":
            c = pt.sink_generic_tracer_depends_layer_cnt
            kmax = self.km - 1 if c == -1 else c - 1
            for k2 in range(min(k, kmax), -1, -1):
                cols.append(base + self.int3[k2, j, i])
        pos["sink_other_tracers"] = len(cols)
        for t2 in range(self.nt):
            if t2 == t:
                continue
            cols.append(t2 * self.tsl + self.int3[k, j, i])
        return cols, pos

    def _init_matrix(self):
        self.rows = []      # per flat row: list of [col, val]
        self.cat = []       # per flat row: category positions
        for t in range(self.nt):
            for (i, j, k) in self.cells:
                cols, pos = self._row_slots(t, i, j, k)
                self.rows.append([[c, 0.0] for c in cols])
                self.cat.append(pos)

    def _slot(self, t, ind, cat, off=0):
        row = self.rows[t * self.tsl + ind]
        return row, self.cat[t * self.tsl + ind][cat] + off

    # -- field loads -------------------------------------------------------

    def _load_UTE(self):
        W = self.circ.get3_fv0("UVEL")
        DY = self.circ.get2_fv0("DYU")
        UTE = np.zeros((self.km, self.jmt, self.imt))
        for k in range(self.km):
            for j in range(1, self.jmt - 1):
                for i in range(self.imt):
                    if k < self.KMU[j, i]:
                        UTE[k, j, i] += 0.5 * W[k, j, i] * DY[j, i]
                    if k < self.KMU[j - 1, i]:
                        UTE[k, j, i] += 0.5 * W[k, j - 1, i] * DY[j - 1, i]
        if self.opts.hmix_type == "hor_file":
            WI = self.circ.get3_fv0("UISOP")
            HTE = self.circ.get2_fv0("HTE")
            for k in range(self.km):
                for j in range(1, self.jmt - 1):
                    for i in range(self.imt):
                        ip1 = i + 1 if i < self.imt - 1 else 0
                        if k < self.KMT[j, i] and k < self.KMT[j, ip1]:
                            UTE[k, j, i] += WI[k, j, i] * HTE[j, i]
        return UTE

    def _load_VTN(self):
        W = self.circ.get3_fv0("VVEL")
        DX = self.circ.get2_fv0("DXU")
        VTN = np.zeros((self.km, self.jmt, self.imt))
        for k in range(self.km):
            for j in range(1, self.jmt - 1):
                for i in range(self.imt):
                    im1 = i - 1 if i > 0 else self.imt - 1
                    if k < self.KMU[j, i]:
                        VTN[k, j, i] += 0.5 * W[k, j, i] * DX[j, i]
                    if k < self.KMU[j, im1]:
                        VTN[k, j, i] += 0.5 * W[k, j, im1] * DX[j, im1]
        if self.opts.hmix_type == "hor_file":
            WI = self.circ.get3_fv0("VISOP")
            HTN = self.circ.get2_fv0("HTN")
            for k in range(self.km):
                for j in range(1, self.jmt - 1):
                    for i in range(self.imt):
                        if k < self.KMT[j, i] and k < self.KMT[j + 1, i]:
                            VTN[k, j, i] += WI[k, j, i] * HTN[j, i]
        return VTN

    def _load_WVEL(self):
        W = self.circ.get3_fv0("WVEL")
        WVEL = np.zeros((self.km, self.jmt, self.imt))
        for k in range(self.km):
            for j in range(1, self.jmt - 1):
                for i in range(self.imt):
                    if k < self.KMT[j, i]:
                        WVEL[k, j, i] += W[k, j, i]
        if self.opts.hmix_type == "hor_file":
            WI = self.circ.get3_fv0("WISOP")
            for k in range(self.km):
                for j in range(1, self.jmt - 1):
                    for i in range(self.imt):
                        if k < self.KMT[j, i]:
                            WVEL[k, j, i] += WI[k, j, i]
        WVEL[0, 1:-1, :] = 0.0
        return WVEL

    # -- advection ---------------------------------------------------------

    def add_adv(self):
        o = self.opts
        if o.adv_type == "none":
            return
        if o.adv_type in ("donor", "centered"):
            self._add_UTE(self._load_UTE())
            self._add_VTN(self._load_VTN())
            self._add_WVEL(self._load_WVEL())
        else:
            POS = self.circ.get3_fv0("UTE_POS")
            NEG = self.circ.get3_fv0("UTE_NEG")
            self._add_UTE_up3(POS, NEG)
            POS = self.circ.get3_fv0("VTN_POS")
            NEG = self.circ.get3_fv0("VTN_NEG")
            self._add_VTN_up3(POS, NEG)
            POS = self.circ.get3_fv0("WTK_POS")
            NEG = self.circ.get3_fv0("WTK_NEG")
            POS[0, 1:-1, :] = 0.0
            NEG[0, 1:-1, :] = 0.0
            self._add_WVEL_up3(POS, NEG)

    def _walk_face(self, row, ci, i, j, k, updates):
        """Walk the 7 face slots applying updates {name: delta}."""
        KMT = self.KMT
        ip1, im1, _, _ = self._nbrs(i)
        for delta in updates.get("self", []):
            row[ci][1] += delta
        ci += 1
        if k - 1 >= 0:
            for delta in updates.get("shallower", []):
                row[ci][1] += delta
            ci += 1
        if k + 1 < KMT[j, i]:
            for delta in updates.get("deeper", []):
                row[ci][1] += delta
            ci += 1
        if k < KMT[j, ip1]:
            for delta in updates.get("east", []):
                row[ci][1] += delta
            ci += 1
        if k < KMT[j, im1]:
            for delta in updates.get("west", []):
                row[ci][1] += delta
            ci += 1
        if k < KMT[j + 1, i]:
            for delta in updates.get("north", []):
                row[ci][1] += delta
            ci += 1
        if k < KMT[j - 1, i]:
            for delta in updates.get("south", []):
                row[ci][1] += delta
            ci += 1
        return ci

    def _add_UTE(self, UTE):
        donor = self.opts.adv_type == "donor"
        for t in range(self.nt):
            for ind, (i, j, k) in enumerate(self.cells):
                ip1, im1, _, _ = self._nbrs(i)
                if donor:
                    e_w = 1.0 if UTE[k, j, i] > 0.0 else 0.0
                    w_w = 1.0 if UTE[k, j, im1] < 0.0 else 0.0
                else:
                    e_w = w_w = 0.5
                TA = self.TAREA[j, i]
                up = {"self": [], "east": [], "west": []}
                if k < self.KMT[j, ip1]:
                    up["self"].append(-(e_w * UTE[k, j, i] / TA * self.dt))
                if k < self.KMT[j, im1]:
                    up["self"].append(w_w * UTE[k, j, im1] / TA * self.dt)
                up["east"].append(-((1.0 - e_w) * UTE[k, j, i] / TA * self.dt))
                up["west"].append((1.0 - w_w) * UTE[k, j, im1] / TA * self.dt)
                row, ci = self._slot(t, ind, "self")
                self._walk_face(row, ci, i, j, k, up)

    def _add_VTN(self, VTN):
        donor = self.opts.adv_type == "donor"
        for t in range(self.nt):
            for ind, (i, j, k) in enumerate(self.cells):
                if donor:
                    n_w = 1.0 if VTN[k, j, i] > 0.0 else 0.0
                    s_w = 1.0 if VTN[k, j - 1, i] < 0.0 else 0.0
                else:
                    n_w = s_w = 0.5
                TA = self.TAREA[j, i]
                up = {"self": [], "north": [], "south": []}
                if k < self.KMT[j + 1, i]:
                    up["self"].append(-(n_w * VTN[k, j, i] / TA * self.dt))
                if k < self.KMT[j - 1, i]:
                    up["self"].append(s_w * VTN[k, j - 1, i] / TA * self.dt)
                up["north"].append(-((1.0 - n_w) * VTN[k, j, i] / TA * self.dt))
                up["south"].append((1.0 - s_w) * VTN[k, j - 1, i] / TA * self.dt)
                row, ci = self._slot(t, ind, "self")
                self._walk_face(row, ci, i, j, k, up)

    def _add_WVEL(self, WVEL):
        donor = self.opts.adv_type == "donor"
        km = self.km
        for t in range(self.nt):
            for ind, (i, j, k) in enumerate(self.cells):
                Wk = WVEL[k, j, i]
                Wb = WVEL[k + 1, j, i] if k + 1 < km else 0.0
                if donor:
                    t_w = 1.0 if Wk > 0.0 else 0.0
                    b_w = 1.0 if Wb < 0.0 else 0.0
                else:
                    t_w = b_w = 0.5
                dzk = self.dz[k]
                up = {"self": [], "shallower": [], "deeper": []}
                if k - 1 >= 0:
                    up["self"].append(-(t_w * Wk / dzk * self.dt))
                if k + 1 < self.KMT[j, i]:
                    up["self"].append(b_w * Wb / dzk * self.dt)
                up["shallower"].append(-((1.0 - t_w) * Wk / dzk * self.dt))
                up["deeper"].append((1.0 - b_w) * Wb / dzk * self.dt)
                row, ci = self._slot(t, ind, "self")
                self._walk_face(row, ci, i, j, k, up)

    def _walk_adv2(self, row, ci, i, j, k, updates):
        KMT, jmt = self.KMT, self.jmt
        _, _, ip2, im2 = self._nbrs(i)
        if k - 2 >= 0:
            for d in updates.get("sh2", []):
                row[ci][1] += d
            ci += 1
        if k + 2 < KMT[j, i]:
            for d in updates.get("dp2", []):
                row[ci][1] += d
            ci += 1
        if k < KMT[j, ip2]:
            for d in updates.get("east2", []):
                row[ci][1] += d
            ci += 1
        if k < KMT[j, im2]:
            for d in updates.get("west2", []):
                row[ci][1] += d
            ci += 1
        if j + 2 < jmt and k < KMT[j + 2, i]:
            for d in updates.get("north2", []):
                row[ci][1] += d
            ci += 1
        if j - 2 >= 0 and k < KMT[j - 2, i]:
            for d in updates.get("south2", []):
                row[ci][1] += d
            ci += 1
        return ci

    def _add_UTE_up3(self, POS, NEG):
        KMT = self.KMT
        for t in range(self.nt):
            for ind, (i, j, k) in enumerate(self.cells):
                ip1, im1, ip2, im2 = self._nbrs(i)
                TA = self.TAREA[j, i]
                dt = self.dt
                up = {"self": [], "east": [], "west": []}
                if k < KMT[j, im1]:
                    up["self"].append(-(0.75 * POS[k, j, i] / TA * dt))
                else:
                    up["self"].append(-((0.75 - 0.125) * POS[k, j, i] / TA * dt))
                up["self"].append(-(0.375 * NEG[k, j, i] / TA * dt))
                up["self"].append(0.375 * POS[k, j, im1] / TA * dt)
                if k < KMT[j, ip1]:
                    up["self"].append(0.75 * NEG[k, j, im1] / TA * dt)
                else:
                    up["self"].append((0.75 - 0.125) * NEG[k, j, im1] / TA * dt)
                up["east"].append(-(0.375 * POS[k, j, i] / TA * dt))
                if k < KMT[j, ip2]:
                    up["east"].append(-(0.75 * NEG[k, j, i] / TA * dt))
                else:
                    up["east"].append(-((0.75 - 0.125) * NEG[k, j, i] / TA * dt))
                up["east"].append((-0.125) * NEG[k, j, im1] / TA * dt)
                up["west"].append(-((-0.125) * POS[k, j, i] / TA * dt))
                if k < KMT[j, im2]:
                    up["west"].append(0.75 * POS[k, j, im1] / TA * dt)
                else:
                    up["west"].append((0.75 - 0.125) * POS[k, j, im1] / TA * dt)
                up["west"].append(0.375 * NEG[k, j, im1] / TA * dt)
                row, ci = self._slot(t, ind, "self")
                self._walk_face(row, ci, i, j, k, up)
                up2 = {
                    "east2": [-((-0.125) * NEG[k, j, i] / TA * dt)],
                    "west2": [(-0.125) * POS[k, j, im1] / TA * dt],
                }
                row, ci = self._slot(t, ind, "adv_non_nbr")
                self._walk_adv2(row, ci, i, j, k, up2)

    def _add_VTN_up3(self, POS, NEG):
        KMT, jmt = self.KMT, self.jmt
        for t in range(self.nt):
            for ind, (i, j, k) in enumerate(self.cells):
                TA = self.TAREA[j, i]
                dt = self.dt
                up = {"self": [], "north": [], "south": []}
                if k < KMT[j - 1, i]:
                    up["self"].append(-(0.75 * POS[k, j, i] / TA * dt))
                else:
                    up["self"].append(-((0.75 - 0.125) * POS[k, j, i] / TA * dt))
                up["self"].append(-(0.375 * NEG[k, j, i] / TA * dt))
                up["self"].append(0.375 * POS[k, j - 1, i] / TA * dt)
                if k < KMT[j + 1, i]:
                    up["self"].append(0.75 * NEG[k, j - 1, i] / TA * dt)
                else:
                    up["self"].append((0.75 - 0.125) * NEG[k, j - 1, i] / TA * dt)
                up["north"].append(-(0.375 * POS[k, j, i] / TA * dt))
                if j + 2 < jmt and k < KMT[j + 2, i]:
                    up["north"].append(-(0.75 * NEG[k, j, i] / TA * dt))
                else:
                    up["north"].append(-((0.75 - 0.125) * NEG[k, j, i] / TA * dt))
                up["north"].append((-0.125) * NEG[k, j - 1, i] / TA * dt)
                up["south"].append(-((-0.125) * POS[k, j, i] / TA * dt))
                if j - 2 >= 0 and k < KMT[j - 2, i]:
                    up["south"].append(0.75 * POS[k, j - 1, i] / TA * dt)
                else:
                    up["south"].append((0.75 - 0.125) * POS[k, j - 1, i] / TA * dt)
                up["south"].append(0.375 * NEG[k, j - 1, i] / TA * dt)
                row, ci = self._slot(t, ind, "self")
                self._walk_face(row, ci, i, j, k, up)
                up2 = {
                    "north2": [-((-0.125) * NEG[k, j, i] / TA * dt)],
                    "south2": [(-0.125) * POS[k, j - 1, i] / TA * dt],
                }
                row, ci = self._slot(t, ind, "adv_non_nbr")
                self._walk_adv2(row, ci, i, j, k, up2)

    def _add_WVEL_up3(self, POS, NEG):
        km = self.km
        talfzp, tbetzp, tgamzp, talfzm, tbetzm, tdelzm = \
            vertical_upwind3_weights(self.dz)
        KMT = self.KMT
        for t in range(self.nt):
            for ind, (i, j, k) in enumerate(self.cells):
                dzk = self.dz[k]
                dt = self.dt
                up = {"self": [], "shallower": [], "deeper": []}
                if k - 1 >= 0:
                    if k + 1 < KMT[j, i]:
                        up["self"].append(-(talfzm[k - 1] * POS[k, j, i] / dzk * dt))
                    else:
                        up["self"].append(
                            -((talfzm[k - 1] + tdelzm[k - 1]) * POS[k, j, i] / dzk * dt))
                    up["self"].append(-(talfzp[k - 1] * NEG[k, j, i] / dzk * dt))
                if k + 1 < KMT[j, i]:
                    up["self"].append(tbetzm[k] * POS[k + 1, j, i] / dzk * dt)
                    up["self"].append(tbetzp[k] * NEG[k + 1, j, i] / dzk * dt)
                if k - 1 >= 0:
                    up["shallower"].append(-(tbetzm[k - 1] * POS[k, j, i] / dzk * dt))
                    up["shallower"].append(-(tbetzp[k - 1] * NEG[k, j, i] / dzk * dt))
                    if k + 1 < KMT[j, i]:
                        up["shallower"].append(tgamzp[k] * NEG[k + 1, j, i] / dzk * dt)
                if k + 1 < KMT[j, i]:
                    if k - 1 >= 0:
                        up["deeper"].append(-(tdelzm[k - 1] * POS[k, j, i] / dzk * dt))
                    if k + 2 < KMT[j, i]:
                        up["deeper"].append(talfzm[k] * POS[k + 1, j, i] / dzk * dt)
                    else:
                        up["deeper"].append(
                            (talfzm[k] + tdelzm[k]) * POS[k + 1, j, i] / dzk * dt)
                    up["deeper"].append(talfzp[k] * NEG[k + 1, j, i] / dzk * dt)
                row, ci = self._slot(t, ind, "self")
                self._walk_face(row, ci, i, j, k, up)
                up2 = {}
                if k - 2 >= 0:
                    up2["sh2"] = [-(tgamzp[k - 1] * NEG[k, j, i] / dzk * dt)]
                if k + 2 < KMT[j, i]:
                    up2["dp2"] = [tdelzm[k] * POS[k + 1, j, i] / dzk * dt]
                row, ci = self._slot(t, ind, "adv_non_nbr")
                self._walk_adv2(row, ci, i, j, k, up2)

    def adv_enforce_divfree(self):
        for t in range(self.nt):
            for ind, (i, j, k) in enumerate(self.cells):
                row, ci = self._slot(t, ind, "self")
                end = self.cat[t * self.tsl + ind]["hmix_non_nbr"]
                s = 0.0
                for c in range(ci + 1, end):
                    s += row[c][1]
                row[ci][1] = -s

    # -- hmix --------------------------------------------------------------

    def add_hmix(self):
        o = self.opts
        if o.hmix_type == "none":
            return
        if o.hmix_type == "isop_file":
            self._add_hmix_isop()
        else:
            self._add_hmix_lap(const=(o.hmix_type == "const"))

    def _add_hmix_lap(self, const: bool):
        KMT = self.KMT
        HUS = self.circ.get2_fv0("HUS")
        HTE = self.circ.get2_fv0("HTE")
        HUW = self.circ.get2_fv0("HUW")
        HTN = self.circ.get2_fv0("HTN")
        if const:
            ah = 4.0e6
        else:
            KAPPA = self.circ.get3_fv0("KAPPA_ISOP")
            WORK = self.circ.get3_fv0("HOR_DIFF")
            for k in range(self.km):
                for j in range(1, self.jmt - 1):
                    for i in range(self.imt):
                        if k < KMT[j, i]:
                            KAPPA[k, j, i] += WORK[k, j, i]
        for t in range(self.nt):
            for ind, (i, j, k) in enumerate(self.cells):
                ip1, im1, _, _ = self._nbrs(i)
                TA = self.TAREA[j, i]
                dt = self.dt
                if const:
                    ke = kw = kn = ks = ah
                else:
                    ke = 0.5 * (KAPPA[k, j, i] + KAPPA[k, j, ip1])
                    kw = 0.5 * (KAPPA[k, j, im1] + KAPPA[k, j, i])
                    kn = 0.5 * (KAPPA[k, j, i] + KAPPA[k, j + 1, i])
                    ks = 0.5 * (KAPPA[k, j - 1, i] + KAPPA[k, j, i])
                ce = ke * HTE[j, i] / HUS[j, i] / TA * dt if k < KMT[j, ip1] else 0.0
                cw = kw * HTE[j, im1] / HUS[j, im1] / TA * dt if k < KMT[j, im1] else 0.0
                cn = kn * HTN[j, i] / HUW[j, i] / TA * dt if k < KMT[j + 1, i] else 0.0
                cs = ks * HTN[j - 1, i] / HUW[j - 1, i] / TA * dt if k < KMT[j - 1, i] else 0.0
                up = {"self": [-(ce + cw + cn + cs)], "east": [ce],
                      "west": [cw], "north": [cn], "south": [cs]}
                row, ci = self._slot(t, ind, "self")
                self._walk_face(row, ci, i, j, k, up)

    def _add_hmix_isop(self):
        KMT = self.KMT
        for ip in range(4):
            for jp in range(3):
                for kp in range(3):
                    name = f"HDIF_EXPLICIT_3D_IRF_{ip + 1}_{jp + 1}_{kp + 1}"
                    if not self.circ.exists(name):
                        name = f"HDIF_EXPLICIT_3D_IRF_NK_{ip + 1}_{jp + 1}_{kp + 1}"
                    IRF = self.circ.get3(name)
                    for t in range(self.nt):
                        for ind, (i, j, k) in enumerate(self.cells):
                            ip1, im1, _, _ = self._nbrs(i)
                            val = IRF[k, j, i] * self.dt
                            up = {"self": [], "shallower": [], "deeper": [],
                                  "east": [], "west": [], "north": [], "south": []}

                            def m(ii_, jj_, kk_):
                                return (ii_ % 4 == ip and jj_ % 3 == jp
                                        and kk_ % 3 == kp)

                            if m(i, j, k):
                                up["self"].append(val)
                            if k - 1 >= 0 and m(i, j, k - 1):
                                up["shallower"].append(val)
                            if m(i, j, k + 1):
                                up["deeper"].append(val)
                            if m(ip1, j, k):
                                up["east"].append(val)
                            if m(im1, j, k):
                                up["west"].append(val)
                            if m(i, j + 1, k):
                                up["north"].append(val)
                            if m(i, j - 1, k):
                                up["south"].append(val)
                            row, ci = self._slot(t, ind, "self")
                            self._walk_face(row, ci, i, j, k, up)
                            # vertical diagonals
                            row, ci = self._slot(t, ind, "hmix_non_nbr")
                            for (dk, tji, tii) in [(-1, j, ip1), (1, j, ip1),
                                                   (-1, j, im1), (1, j, im1),
                                                   (-1, j + 1, i), (1, j + 1, i),
                                                   (-1, j - 1, i), (1, j - 1, i)]:
                                kk_ = k + dk
                                if kk_ >= 0 and kk_ < KMT[tji, tii]:
                                    if m(tii, tji, kk_):
                                        row[ci][1] += val
                                    ci += 1

    # -- vmix --------------------------------------------------------------

    def add_vmix(self):
        o = self.opts
        if o.vmix_type == "none":
            return
        if o.vmix_type == "matrix_file":
            self._add_vmix_matrix()
            return
        if o.vmix_type == "file":
            VDC = self.circ.get3_fv0("VDC_S")
            GM = self.circ.get3_fv0("VDC_GM")
            for k in range(self.km):
                for j in range(1, self.jmt - 1):
                    for i in range(self.imt):
                        VDC[k, j, i] += GM[k, j, i]
        else:
            VDC = np.full((self.km, self.jmt, self.imt), 0.1)
        for t in range(self.nt):
            for ind, (i, j, k) in enumerate(self.cells):
                dzv = self.dz
                ct = (VDC[k - 1, j, i] / (0.5 * (dzv[k - 1] + dzv[k])) / dzv[k]
                      * self.dt) if k - 1 >= 0 else 0.0
                cb = (VDC[k, j, i] / (0.5 * (dzv[k] + dzv[k + 1])) / dzv[k]
                      * self.dt) if k + 1 < self.KMT[j, i] else 0.0
                up = {"self": [-(ct + cb)], "shallower": [ct], "deeper": [cb]}
                row, ci = self._slot(t, ind, "self")
                self._walk_face(row, ci, i, j, k, up)

    def _add_vmix_matrix(self):
        for kp in range(self.km):
            field = self.circ.get3(f"vmix_matrix_{kp + 1:03d}_CUR")
            for t in range(self.nt):
                for ind, (i, j, k) in enumerate(self.cells):
                    row, ci = self._slot(t, ind, "vmix_non_nbr")
                    for k2 in range(self.KMT[j, i]):
                        if k2 == kp:
                            row[ci][1] += field[k, j, i] * self.dt
                        ci += 1

    # -- sinks / surface ---------------------------------------------------

    def add_sinks_and_surface(self):
        o = self.opts
        for t in range(self.nt):
            pt = o.per_tracer[t]
            if pt.sink_type == "const":
                for ind in range(self.tsl):
                    row, ci = self._slot(t, ind, "self")
                    row[ci][1] += -self.yc * pt.sink_rate
            elif pt.sink_type == "const_shallow":
                for ind, (i, j, k) in enumerate(self.cells):
                    if self.z_t[k] < pt.sink_depth:
                        row, ci = self._slot(t, ind, "self")
                        row[ci][1] += -self.yc * pt.sink_rate
            elif pt.sink_type == "file":
                F = self.tracer.get3(pt.sink_field_name)
                for ind, (i, j, k) in enumerate(self.cells):
                    row, ci = self._slot(t, ind, "self")
                    row[ci][1] += -self.yc * F[k, j, i]
        # generic tracer
        for t in range(self.nt):
            pt = o.per_tracer[t]
            if pt.sink_type != "generic_tracer":
                continue
            name = pt.sink_generic_tracer_name
            c = pt.sink_generic_tracer_depends_layer_cnt
            kmax = self.km - 1 if c == -1 else c - 1
            diag_name = f"d_J_{name}_d_{name}"
            if self.tracer.exists(diag_name):
                F = self.tracer.get3(diag_name)
                for ind, (i, j, k) in enumerate(self.cells):
                    row, ci = self._slot(t, ind, "self")
                    row[ci][1] += self.dt * F[k, j, i]
            fields_sh = {}
            for k2 in range(kmax + 1):
                n2 = f"d_J_{name}_d_{name}_k_{k2 + 1:02d}"
                if self.tracer.exists(n2):
                    fields_sh[k2] = self.tracer.get3(n2)
            for ind, (i, j, k) in enumerate(self.cells):
                row, ci = self._slot(t, ind, "sink_non_nbr")
                for k2 in range(min(k, kmax), -1, -1):
                    if k2 in fields_sh:
                        row[ci][1] += self.dt * fields_sh[k2][k, j, i]
                    ci += 1
        # coupled-tracer sinks
        names = COUPLED_TRACER_NAMES.get(o.coupled_tracer_type)
        if names is not None:
            for t in range(self.nt):
                flds = {}
                for t2 in range(self.nt):
                    if t2 == t:
                        continue
                    n = f"d_J_{names[t]}_d_{names[t2]}"
                    if self.tracer is not None and self.tracer.exists(n):
                        flds[t2] = self.tracer.get3(n)
                for ind, (i, j, k) in enumerate(self.cells):
                    row, ci = self._slot(t, ind, "sink_other_tracers")
                    for t2 in range(self.nt):
                        if t2 == t:
                            continue
                        if t2 in flds:
                            row[ci][1] += self.dt * flds[t2][k, j, i]
                        ci += 1
        # pv
        for t in range(self.nt):
            pt = o.per_tracer[t]
            if pt.pv_field_name is not None:
                pv = self.tracer.get2(pt.pv_field_name)
                for ind, (i, j, k) in enumerate(self.cells):
                    if k == 0:
                        row, ci = self._slot(t, ind, "self")
                        row[ci][1] -= pv[j, i] / self.dz[0] * self.dt
        # d_SF_d_TRACER
        for t in range(self.nt):
            pt = o.per_tracer[t]
            if pt.d_SF_d_TRACER_field_name is not None:
                dsf = self.tracer.get2(pt.d_SF_d_TRACER_field_name)
                for ind, (i, j, k) in enumerate(self.cells):
                    if k == 0:
                        row, ci = self._slot(t, ind, "self")
                        row[ci][1] += dsf[j, i] / self.dz[0] * self.dt
        # coupled-tracer surface fluxes (DIC/ALK only)
        if o.coupled_tracer_type == "DIC_SHADOW_ALK_SHADOW":
            names = COUPLED_TRACER_NAMES[o.coupled_tracer_type]
            for t in range(self.nt):
                flds = {}
                for t2 in range(self.nt):
                    if t2 == t:
                        continue
                    n = f"d_SF_{names[t]}_d_{names[t2]}"
                    if self.tracer is not None and self.tracer.exists(n):
                        flds[t2] = self.tracer.get2(n)
                for ind, (i, j, k) in enumerate(self.cells):
                    row, ci = self._slot(t, ind, "sink_other_tracers")
                    for t2 in range(self.nt):
                        if t2 == t:
                            continue
                        if t2 in flds and k == 0:
                            row[ci][1] += self.dt * flds[t2][j, i] / self.dz[0]
                        ci += 1

    # -- post-processing ---------------------------------------------------

    def finalize(self):
        """sum_dup_vals + strip_matrix_zeros + sort_cols_all_rows."""
        nz, ci, rp = [], [], [0]
        for row in self.rows:
            # sum duplicates: first occurrence accumulates later ones
            for a in range(len(row)):
                for b in range(a + 1, len(row)):
                    if row[b][0] == row[a][0] and row[b][1] is not None \
                            and row[a][1] is not None:
                        row[a][1] += row[b][1]
                        row[b][1] = 0.0
            kept = [(c, v) for c, v in row if v != 0.0]
            kept.sort(key=lambda cv: cv[0])
            for c, v in kept:
                ci.append(c)
                nz.append(v)
            rp.append(len(ci))
        return (np.array(nz, dtype=np.float64), np.array(ci, dtype=np.int64),
                np.array(rp, dtype=np.int64))

    def build(self):
        self.add_adv()
        if self.opts.l_adv_enforce_divfree:
            self.adv_enforce_divfree()
        self.add_hmix()
        self.add_vmix()
        self.add_sinks_and_surface()
        return self.finalize()
