"""Checkpoint / resume.

Replaces the reference's filesystem parameter store — one directory per
unit holding ``HMM/transmat.npy``, ``HMM/pi.npy``, ``HMM/HMM_config.ini``
and per-state ``GMM_<k>/{GMM_means,GMM_covariance,GMM_weight}.npy`` +
``GMM_config.ini`` (``LHMM.py:192-254``, ``Clustering.py:234-312``) plus
the ``trainInfo_<job>.csv`` resume ledger (``AcousticModel.py:311-329``)
— with:

* a single sharded checkpoint of the senone-bank pytree (orbax when
  available, ``.npz`` fallback), and
* a JSON manifest carrying the training phase/round/mixture level, which
  subsumes the unit-granular trainInfo resume: bank updates are atomic
  per round, so resume restarts at the round boundary (SURVEY.md §5
  "checkpoint/resume").

Interop: :func:`export_reference_layout` / :func:`import_reference_layout`
read and write the reference's per-unit directory format so parameters
can move between the two systems.
"""

from __future__ import annotations

import configparser
import dataclasses
import json
import os

import jax.numpy as jnp
import numpy as np

from poccala_tpu.io.corpus import UnitInventory
from poccala_tpu.models.senone_bank import SenoneBank
from poccala_tpu.utils.errors import ParameterFileError
from poccala_tpu.utils.logmath import masked_log

_FIELDS = ("means", "log_var", "log_w", "log_A", "log_pi", "mix_counts",
           "senone_map")


def save_checkpoint(path: str, bank: SenoneBank, manifest: dict | None = None,
                    units: list[str] | None = None) -> None:
    """Write ``bank.npz`` + ``manifest.json`` under ``path``."""
    os.makedirs(path, exist_ok=True)
    arrays = {f: np.asarray(getattr(bank, f)) for f in _FIELDS}
    np.savez(os.path.join(path, "bank.npz"), **arrays)
    man = dict(manifest or {})
    if units is not None:
        man["units"] = units
    man["shapes"] = {f: list(arrays[f].shape) for f in _FIELDS}
    with open(os.path.join(path, "manifest.json"), "w") as f:
        json.dump(man, f, indent=2)


def load_checkpoint(path: str) -> tuple[SenoneBank, dict]:
    """Load a checkpoint directory -> (bank, manifest)."""
    npz_path = os.path.join(path, "bank.npz")
    if not os.path.exists(npz_path):
        raise ParameterFileError(f"no checkpoint at {path}")
    data = np.load(npz_path)
    bank = SenoneBank(**{f: jnp.asarray(data[f]) for f in _FIELDS})
    manifest = {}
    man_path = os.path.join(path, "manifest.json")
    if os.path.exists(man_path):
        with open(man_path) as f:
            manifest = json.load(f)
    return bank, manifest


# ----------------------------------------------------------------------
# Reference-layout interop
# ----------------------------------------------------------------------

def export_reference_layout(root: str, bank: SenoneBank,
                            inventory: UnitInventory,
                            unit_type: str = "XIF_tone",
                            fix_code: int = 0) -> None:
    """Write the reference's per-unit parameter directories
    (``PARAMETERS_FILE_PATH/<unit_type>/<unit>/...``,
    ``LHMM.save_parameter`` ``LHMM.py:192-209``, ``GMM.save_parameter``
    ``Clustering.py:234-255``)."""
    base = os.path.join(root, unit_type)
    os.makedirs(base, exist_ok=True)
    n = bank.state_num
    emit = bank.emit_states
    means = np.asarray(bank.means)
    var = np.exp(np.asarray(bank.log_var))
    w = np.exp(np.asarray(bank.log_w))
    log_a = np.asarray(bank.log_A)
    pi = np.exp(np.asarray(bank.log_pi))
    mix_counts = np.asarray(bank.mix_counts)
    senone_map = np.asarray(bank.senone_map)

    for u, unit in enumerate(inventory.units):
        unit_dir = os.path.join(base, unit)
        hmm_dir = os.path.join(unit_dir, "HMM")
        os.makedirs(hmm_dir, exist_ok=True)
        np.save(os.path.join(hmm_dir, "transmat.npy"), np.exp(log_a[u]))
        np.save(os.path.join(hmm_dir, "pi.npy"), pi[u])
        cp = configparser.ConfigParser()
        cp.add_section("Configuration")
        cp.set("Configuration", "FIX_CODE", str(fix_code))
        with open(os.path.join(hmm_dir, "HMM_config.ini"), "w") as f:
            cp.write(f)
        for e in range(emit):
            s = int(senone_map[u, e])  # tied states export shared params
            m_act = int(mix_counts[s])
            gmm_dir = os.path.join(unit_dir, f"GMM_{e}")
            os.makedirs(gmm_dir, exist_ok=True)
            np.save(os.path.join(gmm_dir, "GMM_means.npy"), means[s, :m_act])
            cov = np.stack([np.diag(var[s, mi]) for mi in range(m_act)])
            np.save(os.path.join(gmm_dir, "GMM_covariance.npy"), cov)
            np.save(os.path.join(gmm_dir, "GMM_weight.npy"), w[s, :m_act])
            cp = configparser.ConfigParser()
            cp.add_section("Configuration")
            cp.set("Configuration", "MIXTURE", str(m_act))
            cp.set("Configuration", "DIMENSION", str(bank.dim))
            cp.set("Configuration", "BIAS", "100.0")
            with open(os.path.join(gmm_dir, "GMM_config.ini"), "w") as f:
                cp.write(f)


def import_reference_layout(root: str, inventory: UnitInventory,
                            unit_type: str, state_num: int,
                            max_mix: int) -> SenoneBank:
    """Load a reference-format parameter store into a bank
    (``AcousticModel.init_parameter``, ``AcousticModel.py:228-240``)."""
    base = os.path.join(root, unit_type)
    emit = state_num - 2
    u_total = len(inventory)
    first = None
    banks = {}
    for u, unit in enumerate(inventory.units):
        unit_dir = os.path.join(base, unit)
        if not os.path.isdir(unit_dir):
            raise ParameterFileError(f"missing unit directory: {unit_dir}")
        transmat = np.load(os.path.join(unit_dir, "HMM", "transmat.npy"))
        pi = np.load(os.path.join(unit_dir, "HMM", "pi.npy"))
        gmms = []
        for e in range(emit):
            gmm_dir = os.path.join(unit_dir, f"GMM_{e}")
            mu = np.load(os.path.join(gmm_dir, "GMM_means.npy"))
            cov = np.load(os.path.join(gmm_dir, "GMM_covariance.npy"))
            wt = np.load(os.path.join(gmm_dir, "GMM_weight.npy"))
            cov = np.squeeze(cov)
            if cov.ndim == 2:  # single mixture [D, D]
                cov = cov[None]
            var = np.stack([np.diag(c) for c in cov])
            gmms.append((mu, var, wt))
            if first is None:
                first = mu.shape[-1]
        banks[u] = (transmat, pi, gmms)

    d = first
    s_total = u_total * emit
    means = np.zeros((s_total, max_mix, d), np.float32)
    var = np.ones((s_total, max_mix, d), np.float32)
    w = np.zeros((s_total, max_mix), np.float32)
    mix_counts = np.zeros((s_total,), np.int32)
    log_a = np.zeros((u_total, state_num, state_num), np.float32)
    pi_all = np.zeros((u_total, state_num), np.float32)
    for u in range(u_total):
        transmat, pi, gmms = banks[u]
        with np.errstate(divide="ignore"):
            log_a[u] = np.where(transmat > 0, np.log(np.maximum(transmat, 1e-300)), -1e30)
        pi_all[u] = pi
        for e, (mu, v, wt) in enumerate(gmms):
            s = u * emit + e
            m_act = len(wt)
            means[s, :m_act] = mu
            var[s, :m_act] = np.maximum(v, 1e-10)
            w[s, :m_act] = wt
            mix_counts[s] = m_act
    from poccala_tpu.models.senone_bank import identity_senone_map

    return SenoneBank(
        means=jnp.asarray(means),
        log_var=jnp.asarray(np.log(var)),
        log_w=masked_log(jnp.asarray(w)),
        log_A=jnp.asarray(log_a),
        log_pi=masked_log(jnp.asarray(np.maximum(pi_all, 0.0))),
        mix_counts=jnp.asarray(mix_counts),
        senone_map=identity_senone_map(u_total, emit),
    )
