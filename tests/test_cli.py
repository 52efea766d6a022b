"""CLI end-to-end: synth corpus -> train -> align -> lexicon -> decode."""

import json
import os

import numpy as np
import pytest

from poccala_tpu import cli


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    return str(tmp_path_factory.mktemp("cli"))


def run(capsys, *argv):
    cli.main(list(argv))
    return capsys.readouterr().out


UNITS_ARGS = None  # set in test via file


class TestCliPipeline:
    def test_full_pipeline(self, workdir, capsys):
        units_file = os.path.join(workdir, "units")
        with open(units_file, "w") as f:
            f.write("test units\nn,i3,h,ao3,m,a1\n")

        # 1. synthetic corpus
        out = run(capsys, "--units", units_file, "synth-corpus",
                  "--out", workdir, "--num-utts", "12")
        dirs = json.loads(out)
        assert os.path.isdir(dirs["audio_dir"])

        common = [
            "--units", units_file,
            "--set", f"paths.audio_file_path={dirs['audio_dir']}",
            "--set", f"paths.label_file_path={dirs['label_dir']}",
            "--set", "train.load_line=0",
            "--set", "frontend.vad=false",
            "--set", "model.mix_level=1",
            "--set", "model.max_mix_level=2",
            "--set", "train.max_frames=256",
            "--set", "train.batch_size=6",
            "--set", "train.proportion=1.0",
            "--set", "train.step=4",
        ]
        ckpt_dir = os.path.join(workdir, "ckpt")

        # 2. train (scheme 2, 2 rounds)
        run(capsys, *common, "train", "--mode", "2", "--epochs", "2",
            "--checkpoint", ckpt_dir,
            "--history", os.path.join(workdir, "hist.json"))
        assert os.path.exists(os.path.join(ckpt_dir, "bank.npz"))
        hist = json.load(open(os.path.join(workdir, "hist.json")))
        assert len(hist) == 2 and hist[1]["loglik"] > hist[0]["loglik"]

        # 3. resume training (scheme 1 round on top)
        run(capsys, *common, "train", "--mode", "1", "--epochs", "3",
            "--no-init", "--checkpoint", ckpt_dir, "--resume")

        # 4. align
        out = run(capsys, *common, "align", "--checkpoint", ckpt_dir)
        lines = [json.loads(l) for l in out.strip().splitlines()]
        assert len(lines) == 12
        assert all(np.isfinite(l["score"]) for l in lines)

        # 5. lexicon from word list (built-in G2P table)
        words_file = os.path.join(workdir, "words.txt")
        with open(words_file, "w") as f:
            f.write("你好\n你\n马\n")
        lex_path = os.path.join(workdir, "lex.pkl")
        run(capsys, *common, "build-lexicon", "--words", words_file,
            "--out", lex_path)
        assert os.path.exists(lex_path)

        # 6. LM
        lm_text = os.path.join(workdir, "text.txt")
        with open(lm_text, "w") as f:
            f.write("你好 马\n你好\n")
        lm_path = os.path.join(workdir, "lm.json")
        run(capsys, *common, "train-lm", "--text", lm_text,
            "--out", lm_path)

        # 7. decode a corpus wav (smoke: hypotheses structurally valid)
        wav = os.path.join(dirs["audio_dir"], "utt00000.wav")
        out = run(capsys, *common, "decode", "--checkpoint", ckpt_dir,
                  "--lexicon", lex_path, "--lm", lm_path, wav)
        result = json.loads(out)
        assert result["wav"] == wav
        assert isinstance(result["nbest"], list)

        # 7a. block-pruned decode knobs reach the device tier via --set
        # (tiny lexicon -> pruning a no-op, but the plumbing runs; real
        # pruning behavior is pinned in test_block_pruned.py)
        out = run(capsys, *common, "--set", "decoder.active_blocks=2",
                  "--set", "decoder.block_size=8",
                  "decode", "--decoder", "device",
                  "--checkpoint", ckpt_dir, "--lexicon", lex_path,
                  "--lm", lm_path, wav)
        pruned_result = json.loads(out)
        assert pruned_result["wav"] == wav
        assert isinstance(pruned_result["nbest"], list)

        # 7b. listen (streaming serve path) on the same wav: partial
        # 1-bests per chunk + a final n-best whose top hypothesis
        # matches the one-shot device decode
        out = run(capsys, *common, "listen", "--checkpoint", ckpt_dir,
                  "--lexicon", lex_path, "--lm", lm_path,
                  "--wav", wav, "--chunk-frames", "16")
        lines = [json.loads(l) for l in out.strip().splitlines()]
        assert "final" in lines[-1]
        partials = [l for l in lines[:-1] if "partial" in l]
        assert partials and partials[-1]["frames"] > partials[0]["frames"]
        out = run(capsys, *common, "decode", "--decoder", "device",
                  "--checkpoint", ckpt_dir, "--lexicon", lex_path,
                  "--lm", lm_path, wav)
        one_shot = json.loads(out)
        if one_shot["nbest"] and lines[-1]["final"]:
            assert (lines[-1]["final"][0]["words"]
                    == one_shot["nbest"][0]["words"])

        # 7c. serve (double-buffered batch pipeline) over three wavs:
        # per-wav JSON in input order, 1-best matching the one-shot
        # device decode of the same wav
        wavs = [os.path.join(dirs["audio_dir"], f"utt{i:05d}.wav")
                for i in range(3)]
        wav_list = os.path.join(workdir, "wavs.txt")
        with open(wav_list, "w") as f:
            f.write("\n".join(wavs) + "\n")
        out = run(capsys, *common, "serve", "--checkpoint", ckpt_dir,
                  "--lexicon", lex_path, "--lm", lm_path,
                  "--list", wav_list, "--batch-size", "2",
                  "--frame-bucket", "32", "--nbest", "2")
        served = [json.loads(l) for l in out.strip().splitlines()]
        assert [s["wav"] for s in served] == wavs
        out = run(capsys, *common, "decode", "--decoder", "device",
                  "--checkpoint", ckpt_dir, "--lexicon", lex_path,
                  "--lm", lm_path, wavs[0])
        solo = json.loads(out)
        if solo["nbest"] and served[0]["nbest"]:
            assert (served[0]["nbest"][0]["words"]
                    == solo["nbest"][0]["words"])

        # 8. reference-layout export/import round trip
        ref_dir = os.path.join(workdir, "refparams")
        run(capsys, *common, "--set", "model.unit_type=TESTUNITS",
            "export-ref", "--checkpoint", ckpt_dir, "--out", ref_dir)
        assert os.path.isdir(os.path.join(ref_dir, "TESTUNITS", "n", "HMM"))
        ckpt2 = os.path.join(workdir, "ckpt2")
        run(capsys, *common, "--set", "model.unit_type=TESTUNITS",
            "import-ref", "--src", ref_dir, "--checkpoint", ckpt2)
        from poccala_tpu.train import checkpoint as ck

        bank1, _ = ck.load_checkpoint(ckpt_dir)
        bank2, _ = ck.load_checkpoint(ckpt2)
        assert np.allclose(np.asarray(bank1.log_A), np.asarray(bank2.log_A),
                           atol=1e-5)


class TestCliCdExpand:
    def test_cd_expand_and_decode(self, tmp_path, capsys):
        """CI train -> cd-expand -> decode --cd: the CD workflow as a
        user drives it (checkpoint + sidecar + same lexicon pickle)."""
        from poccala_tpu.io import wav as wav_io
        from poccala_tpu.io.corpus import synth_unit_signal

        wd = str(tmp_path)
        units = ["n", "i3", "h", "ao3", "m", "a1", "sil"]
        units_file = os.path.join(wd, "units")
        with open(units_file, "w") as f:
            f.write("test units\n" + ",".join(units) + "\n")
        table = os.path.join(wd, "table.dat")
        with open(table, "w") as f:
            f.write("4F60\tni3\n597D\thao3\n9A6C\tma1\n")

        # corpus: word line 0, toned-pinyin line 1, sil edges
        words_of = {"你好": ["ni3", "hao3"], "你": ["ni3"],
                    "马": ["ma1"]}
        unit_ids = {u: i for i, u in enumerate(units)}
        syl_units = {"ni3": ["n", "i3"], "hao3": ["h", "ao3"],
                     "ma1": ["m", "a1"]}
        audio = os.path.join(wd, "record")
        label = os.path.join(wd, "label")
        os.makedirs(audio)
        os.makedirs(label)
        rng = np.random.default_rng(7)
        keys = list(words_of)
        for i in range(14):
            ws = [keys[int(rng.integers(len(keys)))]
                  for _ in range(int(rng.integers(1, 3)))]
            syls = [s for w in ws for s in words_of[w]]
            us = ["sil"] + [u for s in syls for u in syl_units[s]] + \
                ["sil"]
            sig = np.concatenate([
                synth_unit_signal(unit_ids[u], 3200, 16000, rng)
                for u in us
            ])
            name = f"utt{i:05d}"
            wav_io.write_wav(os.path.join(audio, name + ".wav"),
                             sig, 16000)
            with open(os.path.join(label, name + ".wav.trn"), "w") as f:
                f.write(" ".join(ws) + "\n"
                        + " ".join(["sil"] + syls + ["sil"]) + "\n")

        common = [
            "--units", units_file,
            "--set", f"paths.audio_file_path={audio}",
            "--set", f"paths.label_file_path={label}",
            "--set", "train.label_format=pinyin",
            "--set", "train.load_line=1",
            "--set", "frontend.vad=false",
            "--set", "model.mix_level=1",
            "--set", "model.max_mix_level=2",
            "--set", "model.var_floor_scale=0.01",
            "--set", "train.max_frames=256",
            "--set", "train.batch_size=7",
            "--set", "train.proportion=1.0",
            "--set", "train.step=4",
        ]
        ckpt_dir = os.path.join(wd, "ckpt")
        run(capsys, *common, "train", "--mode", "2", "--epochs", "2",
            "--checkpoint", ckpt_dir)

        vocab_file = os.path.join(wd, "vocab.txt")
        with open(vocab_file, "w") as f:
            f.write("你好\n你\n马\n")
        cd_ckpt = os.path.join(wd, "ckpt_cd")
        cd_json = os.path.join(wd, "cd.json")
        run(capsys, *common, "cd-expand", "--checkpoint", ckpt_dir,
            "--vocab", vocab_file, "--table", table,
            "--out-checkpoint", cd_ckpt, "--out-cd", cd_json,
            "--target-senones", "60", "--retrain-epochs", "2",
            "--min-occ", "4", "--map-tau", "8")
        assert os.path.exists(os.path.join(cd_ckpt, "bank.npz"))
        assert os.path.exists(cd_json)

        lex_path = os.path.join(wd, "lex.pkl")
        run(capsys, *common, "build-lexicon", "--words", vocab_file,
            "--mandarin-dat", table, "--out", lex_path)

        wav = os.path.join(audio, "utt00000.wav")
        out = run(capsys, *common, "decode", "--decoder", "device",
                  "--checkpoint", cd_ckpt, "--lexicon", lex_path,
                  "--cd", cd_json, wav)
        result = json.loads(out)
        assert result["wav"] == wav
        assert isinstance(result["nbest"], list) and result["nbest"]
        # CD system has more (or equal) senones than the CI parent
        from poccala_tpu.train import checkpoint as ck

        ci_bank, _ = ck.load_checkpoint(ckpt_dir)
        cd_bank, meta = ck.load_checkpoint(cd_ckpt)
        assert meta.get("cd") is True
        assert cd_bank.num_states >= ci_bank.num_states
        assert cd_bank.num_units > len(units)
