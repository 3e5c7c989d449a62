# -*- coding: utf-8 -*-
"""Deterministic synthetic corpus generator.

Writes the SAME logical corpus in two physical layouts:

1. *reference layout* — dataset directories of latin-1 ';'-CSV, Yle
   MAObject XML, Vocapia ASR XML and a flow-mapping JSON, exactly as
   the reference converters consume them (used to produce golden
   triples by executing /root/reference under the rdflib shim);
2. *web_pages parquet* — one Common-Crawl-style row per source unit
   (the engine input per BASELINE input_hint).

Determinism rules (FIXTURES.md): fixed seed; every mapped field's
value is a key of its mapping dictionary; numeric CSV columns are
always populated (pandas dtype parity between whole-file and per-unit
parses); order-dependent quirks (PA stale broadcast_time) are placed
at fixed positions in the global row order.
"""

from __future__ import annotations

import csv
import io
import json
import os
import random
import xml.etree.ElementTree as ET
from datetime import datetime, timedelta

import pyarrow as pa
import pyarrow.parquet as pq

from rdf_converter_spark import mappings
from rdf_converter_spark.sources.extract import extract_text
from rdf_converter_spark.sources.web_pages import page_url, wrap_html
from rdf_converter_spark.textkit import RADIO_CHANNELS

EPOCH = datetime(2019, 5, 14, 0, 0, 0)

FIRST_NAMES = ["Jean", "Marie", "Claire", "Ahmed", "Sofia", "Pekka", "Aino",
               "Mikko", "Hélène", "François", "Aurélie", "Tuomas"]
LAST_NAMES = ["Dupont", "Lefèvre", "Martín", "Virtanen", "Koskinen", "Bernard",
              "Moreau", "García", "Nieminen", "Lahtinen", "Petit", "Durand"]
TITLE_WORDS = ["Journal", "Histoire", "Décibels", "Économie", "Société",
               "Café", "Théâtre", "Voyage", "Musique", "Début", "Soirée",
               "Années", "Mémoire", "Qualité"]
SUMMARY_WORDS = ["émission", "présentée", "aujourd'hui", "spéciale",
                 "consacrée", "à", "la", "culture", "française", "avec",
                 "des", "invités", "très", "célèbres", "débat", "musique"]
KEYWORDS = ["Paris (France)", "Musique classique", "Économie", "Télévision",
            "Cinéma français", "Histoire", "Paix", "Sport", "Événement",
            "Noël", "Jeunesse", "Santé"]
PRODUCERS = ["France Télévisions", "INA Production", "Studio Rivoli",
             "Agence Presse", "Médias du Sud"]
FI_WORDS = ["uutiset", "ohjelma", "keskustelu", "musiikki", "historia",
            "talous", "urheilu", "kulttuuri", "ilta", "aamu", "päivä"]


def _person(rng):
    return rng.choice(FIRST_NAMES) + " " + rng.choice(LAST_NAMES)


def _words(rng, pool, lo, hi):
    return " ".join(rng.choice(pool) for _ in range(rng.randint(lo, hi)))


def _csv_bytes(header, row):
    """(header bytes, row bytes) for a single unit, latin-1, ';'-CSV."""
    buf = io.StringIO()
    w = csv.writer(buf, delimiter=";", lineterminator="\n")
    w.writerow(header)
    head_end = buf.tell()
    w.writerow(row)
    s = buf.getvalue()
    return s[:head_end].encode("latin-1"), s[head_end:].encode("latin-1")


class CorpusBuilder:
    def __init__(self, out_dir, seed=42):
        self.out = out_dir
        self.rng = random.Random(seed)
        self.pages = []  # (url, warc_ts, html, text, lang)
        self.ts_counter = 0

        ch = mappings.ina_channel2code()
        self.ina_radio = sorted(
            k for k, v in ch.items() if v.upper() in RADIO_CHANNELS
        )
        self.ina_tv = sorted(
            k for k, v in ch.items() if v.upper() not in RADIO_CHANNELS
        )
        self.ina_genres = sorted(mappings.ina_genres())
        self.ina_themes = sorted(mappings.ina_themes())
        self.ina_roles = sorted(mappings.ina_code2role())
        # PA credits take the role from credit[:3] (pa_converter.py:451)
        # so only exactly-3-char keys are legal there
        self.ina_roles3 = sorted(
            k for k in mappings.ina_code2role() if len(k) == 3
        )
        self.yle_channels = sorted(mappings.yle_channel2code())
        self.yle_classes = sorted(mappings.yle_class2label())
        self.yle_ep_langs = sorted(mappings.yle_episode_lang())
        self.yle_sub_langs = sorted(mappings.yle_subtitles_lang())
        self.yle_audio_langs = sorted(mappings.yle_audio_lang())
        self.yle_role_ids = sorted(mappings.yle_id2role_en(), key=int)

        self.ld_ids = []      # all LD program ids (some R-prefixed)
        self.pa_ids = []      # all PA notice ids
        self.yle_stems = []   # yle filename stems

    # ------------------------------------------------------------------
    def _add_page(self, doc_type, dataset, file, row, payload, lang):
        html = wrap_html(doc_type, dataset, file, row, payload)
        text = extract_text(doc_type, payload, filename=file)
        url = page_url(doc_type, dataset, file, row)
        ts = EPOCH + timedelta(seconds=60 * self.ts_counter)
        self.ts_counter += 1
        self.pages.append((url, ts, html, text, lang))

    # ------------------------------------------------------------------
    # INA Legal Deposit
    # ------------------------------------------------------------------
    LD_PROGRAM_HEADER = [
        "Identifiant", "Chaine", "TitreTrancheHoraire", "TitreCollection",
        "TitreEmission", "Resume", "Chapeau", "ResumeProducteur",
        "DureeSecondes", "IdentifiantImedia", "IdentifiantMediametrie",
        "Genres", "Thematique", "Descripteurs", "Producteurs", "Generiques",
        "startDate", "endDate",
    ]
    LD_SEGMENT_HEADER = [
        "Identifiant", "TitreSujet", "Chaine", "TitreTrancheHoraire",
        "TitreCollection", "TitreEmission", "Chapeau", "DureeSecondes",
        "Descripteurs", "Generique", "startDate",
    ]

    def build_ld(self, n_programs, n_datasets=2, write_files=True):
        rng = self.rng
        per_ds = max(1, n_programs // n_datasets)
        prog_rows = {}  # dataset -> list of rows
        seg_rows = {}
        self._ld_start = {}

        for i in range(n_programs):
            ds = "d%d" % min(i // per_ds, n_datasets - 1)
            # a slice of ids carry the archive-style R prefix (flow
            # fallback J3 exercises 'R'+identifier)
            pid = ("RLD%05dA" if i % 5 == 4 else "LD%05dA") % i
            self.ld_ids.append(pid)
            radio = i % 3 == 0
            channel = rng.choice(self.ina_radio if radio else self.ina_tv)
            timeslot = rng.choice(["", "Matinée" + "\xa0" + "Info", "Soirée Ciné"])
            collection = rng.choice(["", "Les Essentiels", "Grands Débats",
                                     "L'Été en pente douce"])
            title = _words(rng, TITLE_WORDS, 1, 3)
            if i % 11 == 3:
                title = "Qualité\x19s"  # exercises the U+0019 scrub [Q]
            summary = _words(rng, SUMMARY_WORDS, 4, 10)
            lead = _words(rng, SUMMARY_WORDS, 2, 5)
            prod_summary = _words(rng, SUMMARY_WORDS, 2, 6) if i % 2 else ""
            dur = rng.randint(300, 7200)
            genres = "|".join(rng.sample(self.ina_genres, rng.randint(0, 2)))
            themes = "|".join(rng.sample(self.ina_themes, rng.randint(0, 2)))
            kws = "|".join(rng.sample(KEYWORDS, rng.randint(0, 3)))
            prods = "|".join(rng.sample(PRODUCERS, rng.randint(0, 2)))
            credits = "|".join(
                "uid%d#%s (%s)" % (j, _person(rng), rng.choice(self.ina_roles))
                for j in range(rng.randint(0, 3))
            )
            hour = 24 if i % 7 == 6 else rng.randint(6, 23)  # day-rollover [Q]
            start = "2019-05-%02d %02d:%02d:00" % (
                1 + i % 27, hour, rng.randint(0, 59)
            )
            end_h = (hour + 1 + dur // 3600) % 24
            end = "2019-05-%02d %02d:%02d:00" % (1 + i % 27, end_h, rng.randint(0, 59))
            self._ld_start[pid] = start
            row = [pid, channel, timeslot, collection, title, summary, lead,
                   prod_summary, dur, "IM%s" % pid, "MM%s" % pid, genres,
                   themes, kws, prods, credits, start, end]
            prog_rows.setdefault(ds, []).append(row)

            head, body = _csv_bytes(self.LD_PROGRAM_HEADER, row)
            self._add_page("ld_program", ds, "programs.csv",
                           len(prog_rows[ds]) - 1, head + body, "fr")

            # 0-2 segments for every other program; never under an
            # hour-24 parent (the reference's segment pass would crash
            # parsing the parent startDate at ld_converter.py:554)
            n_segs = rng.randint(0, 2) if (i % 2 == 0 and hour <= 23) else 0
            for j in range(n_segs):
                sid = pid + "%04d" % (j + 1)
                s_hour = hour  # keep same day window; relative times small
                s_start = "2019-05-%02d %02d:%02d:%02d" % (
                    1 + i % 27, s_hour, rng.randint(0, 59), rng.randint(0, 59)
                )
                srow = [sid, _words(rng, TITLE_WORDS, 1, 2), channel, timeslot,
                        collection, _words(rng, TITLE_WORDS, 1, 3),
                        _words(rng, SUMMARY_WORDS, 2, 5),
                        rng.randint(30, 600),
                        "|".join(rng.sample(KEYWORDS, rng.randint(0, 2))),
                        "uid0#%s (%s)" % (_person(rng), rng.choice(self.ina_roles)),
                        s_start]
                seg_rows.setdefault(ds, []).append(srow)
                head, body = _csv_bytes(self.LD_SEGMENT_HEADER, srow)
                self._add_page("ld_segment", ds, "sujets.csv",
                               len(seg_rows[ds]) - 1, head + body, "fr")

        if write_files:
            for ds, rows in prog_rows.items():
                self._write_csv("ld/%s/programs.csv" % ds,
                                self.LD_PROGRAM_HEADER, rows)
            for ds, rows in seg_rows.items():
                self._write_csv("ld/%s/sujets.csv" % ds,
                                self.LD_SEGMENT_HEADER, rows)

    # ------------------------------------------------------------------
    # INA Professional Archive
    # ------------------------------------------------------------------
    PA_HEADER = [
        "Identifiant de la notice", "Canal de diffusion",
        "Titre tranche horaire", "Titre collection", "Titre propre",
        "Résumé", "Notes", "Notes juridiques", "Notes du titre ",
        "Corpus  (Aff.)", "Séquences", "Type de date ", "Durée", "Chapeau",
        "Résumé producteur", "Numéro ISAN", "Date d'enregistrement",
        "Date de création", "Date de modification", "Langue de la notice",
        "Type de notice", "Identifiant Matériels",
        "Identifiant Matériels (info.)", "Matériels  (Détail)",
        "Producteurs (Aff.)", "Générique (Aff. Lig.) ",
        "Descripteurs (Aff. Lig.)", "Genre", "Thématique",
        "Date de diffusion", "Heure de diffusion", "Diffusion (aff.)",
        "Extension géographique (info.)",
    ]
    PA_RADIO = ["France Inter", "France Culture"]

    def _pa_row(self, i, pid, is_segment, heure, diffusion_aff):
        rng = self.rng
        radio = i % 3 == 0
        channels = [c for c in self.PA_RADIO if c in self.ina_radio + self.ina_tv]
        channel = (rng.choice(channels) if radio and channels
                   else rng.choice(self.ina_tv))
        dur_frac = ".79" if i % 9 == 5 else ""
        dur = "%02d:%02d:%02d%s" % (
            rng.randint(0, 2), rng.randint(0, 59), rng.randint(0, 59), dur_frac
        )
        credits = []
        for j in range(rng.randint(0, 2)):
            credits.append("%s %s" % (rng.choice(self.ina_roles3), _person(rng)))
        if i % 13 == 7:
            credits.append("PRE Dupont (Jean)")  # '('-slicing quirk [Q]
        kws = ";".join(
            "%s %s" % (rng.choice(["GEO", "PER", "THE"]), kw)
            for kw in rng.sample(KEYWORDS, rng.randint(0, 2))
        )
        return [
            pid, channel,
            rng.choice(["", "Matinale", "Grand Soir"]),
            rng.choice(["", "Les Enquêtes", "Radioscopie"]),
            _words(rng, TITLE_WORDS, 1, 3),
            _words(rng, SUMMARY_WORDS, 4, 9),
            _words(rng, SUMMARY_WORDS, 0, 3),
            "" if i % 2 else "Droits réservés INA",
            _words(rng, SUMMARY_WORDS, 0, 2),
            rng.choice(["", "Corpus A", "Corpus B"]),
            _words(rng, SUMMARY_WORDS, 0, 4),
            rng.choice(["Date de diffusion", "Date d'enregistrement"]),
            dur,
            _words(rng, SUMMARY_WORDS, 0, 3),
            _words(rng, SUMMARY_WORDS, 0, 3),
            "" if i % 2 else "ISAN %04d-X" % i,
            "" if i % 3 else "%02d/%02d/2018" % (1 + i % 28, 1 + i % 12),
            "%02d/%02d/2019" % (1 + i % 28, 1 + i % 12),
            "%02d/%02d/2019" % (1 + (i + 3) % 28, 1 + i % 12),
            "Français", rng.choice(["Notice simple", "Notice complexe"]),
            "" if i % 4 else "MAT%05d" % i,
            "MATI%05d" % i,
            "Support: Beta numérique",
            "\n".join(rng.sample(PRODUCERS, rng.randint(0, 2))),
            ";".join(credits),
            kws,
            ";".join(rng.sample(self.ina_genres, rng.randint(0, 2))),
            ";".join(rng.sample(self.ina_themes, rng.randint(0, 2))),
            "%02d/%02d/2019" % (1 + i % 28, 1 + i % 12),
            heure, diffusion_aff,
            rng.choice(["", "National", "Régional"]),
        ]

    def build_pa(self, n_notices, n_datasets=2, write_files=True):
        rng = self.rng
        per_ds = max(1, n_notices // n_datasets)
        rows_by_ds = {}

        def add(ds, i, pid, is_segment, heure, diff):
            row = self._pa_row(i, pid, is_segment, heure, diff)
            rows_by_ds.setdefault(ds, []).append(row)
            head, body = _csv_bytes(self.PA_HEADER, row)
            self._add_page("pa", ds, "notices.csv",
                           len(rows_by_ds[ds]) - 1, head + body, "fr")

        i = 0
        for k in range(n_notices):
            ds = "d%d" % min(k // per_ds, n_datasets - 1)
            pid = ("RPA%05d_001" if k % 2 else "PA%05d_001") % k
            self.pa_ids.append(pid)
            heure = "%02d:%02d:00" % (rng.randint(6, 23), rng.randint(0, 59))
            add(ds, i, pid, False, heure, "")
            i += 1
            if k % 3 == 0:  # one segment under this notice
                sid = pid + "_001"
                self.pa_ids.append(sid)
                s_heure = "%02d:%02d:00" % (rng.randint(6, 23), rng.randint(0, 59))
                add(ds, i, sid, True, s_heure, "")
                i += 1

        # extract_time quirk block, fixed position at the end of the
        # last dataset (pa_converter.py:66-79): a '-heure:' marker row
        # then a marker-less row that inherits the stale time [Q]
        last_ds = "d%d" % (n_datasets - 1)
        pid_m = "PAQUIRK1_001"
        self.pa_ids.append(pid_m)
        add(last_ds, i, pid_m, False, "", "diffusion du soir-heure:21:30:00 fin")
        i += 1
        pid_s = "PAQUIRK2_001"
        self.pa_ids.append(pid_s)
        add(last_ds, i, pid_s, False, "", "diffusion sans marqueur")

        if write_files:
            for ds, rows in rows_by_ds.items():
                self._write_csv("pa/%s/notices.csv" % ds, self.PA_HEADER, rows)

    # ------------------------------------------------------------------
    # Yle MAObject XML
    # ------------------------------------------------------------------
    def _yle_doc(self, i):
        rng = self.rng
        stem = "PROG_2019_%05d" % i
        guid = "YLEGUID-%05d" % i
        root = ET.Element("root")
        main = ET.SubElement(root, "MAObject")
        ET.SubElement(main, "GUID").text = guid

        series = rng.choice(["", "Uutisviikko", "Historia elää", "Kesäilta"])
        metas = {
            "SERIES_ID": "SER%03d" % (i % 7) if series else "",
            "SERIES_NAME": series,
            "EPISODE_NUMBER": str(1 + i % 12) if series else "",
            "SUBJECT": _words(rng, FI_WORDS, 0, 2),
            "FI_TITLE": _words(rng, FI_WORDS, 1, 3).capitalize(),
            "SE_TITLE": "" if i % 3 else "Programmet %d" % i,
            "VERSION_NAME": rng.choice(["", "Alkuperäinen", "Uusinta"]),
            "MAINTITLE": _words(rng, FI_WORDS, 1, 2).capitalize(),
            "METRO_PROGRAMME_ID": "METRO%05d" % i,
            "LANGUAGE": rng.choice(self.yle_ep_langs),
            "DURATION": str(rng.randint(600000, 3_600_000)),
            "DESCRIPTION_SHORT": _words(rng, FI_WORDS, 3, 8),
            "SYSTEM_DURATION_TC": "%02d:%02d:%02d:%s" % (
                rng.randint(0, 1), rng.randint(0, 59), rng.randint(0, 59),
                rng.choice(["00", "12"]),
            ),
            "WORKING_TITLE": "" if i % 2 else "wt-%d" % i,
            "ARCHIVE_DATE": "2019%02d%02d" % (1 + i % 12, 1 + i % 28),
            "CLASSIFICATION_COMB_A": rng.choice(self.yle_classes),
            "CLASSIFICATION_CONTENT": rng.choice(self.yle_classes),
            "CLASSIFICATION_MAIN_CLASS": (
                "Tuntematon luokka %d" % i if i % 4 == 3
                else rng.choice(self.yle_classes)
            ),
            "CLASSIFICATION_SUB_CLASS": (
                "[%02d] %s" % (i % 90, rng.choice(self.yle_classes))
                if i % 3 == 0 else rng.choice(self.yle_classes)
            ),
            "WEB_DESCRIPTION": _words(rng, FI_WORDS, 0, 5),
            "WEB_DESCRIPTION_SWE": "" if i % 2 else "svensk text %d" % i,
            "MEDIA_ID": "MEDIA_2019_%05d" % i,
            "SYSTEM_FRAMERATE_FPS": rng.choice(["25", "50"]),
            "VIDEO_FORMAT": rng.choice(["0", "1", "2", "3"]),
            "ASPECT_RATIO": rng.choice(["0", "1", "2"]),
            "FIRSTRUN_DATE": "2019%02d%02d" % (1 + i % 12, 1 + i % 28)
            if i % 2 == 0 else "",
            "FIRSTRUN_TIME": "%02d%02d00" % (i % 24, i % 60)
            if i % 2 == 0 else "",
        }
        for name, value in metas.items():
            m = ET.SubElement(main, "Meta", {"name": name})
            m.text = value

        # content segments stratum inside the main MAObject
        stratum = ET.SubElement(
            main, "StratumEx", {"name": "CONTENT_DESCRIPTION"}
        )
        seglist = ET.SubElement(stratum, "SegmentList")
        n_segs = rng.randint(0, 3)
        seg_guids = []
        for j in range(n_segs):
            begin = rng.randint(0, 1_000_000)
            attrs = {"begin": str(begin), "end": str(begin + rng.randint(1000, 600_000))}
            if j == 2:
                pass  # no contentid -> skipped (yle_converter.py:496)
            elif j == 1 and i % 5 == 0:
                attrs["contentid"] = "SEGGUID-%05d-orphan" % i  # no match
            else:
                sg = "SEGGUID-%05d-%d" % (i, j)
                attrs["contentid"] = sg
                seg_guids.append(sg)
            ET.SubElement(seglist, "Segment", attrs)
        for sg in seg_guids:
            desc_obj = ET.SubElement(root, "MAObject",
                                     {"mdclass": "S_CONTENT_DESCRIPTION"})
            ET.SubElement(desc_obj, "GUID").text = sg
            dm = ET.SubElement(desc_obj, "Meta", {"name": "SEGMENT_DESCRIPTION"})
            dm.text = _words(rng, FI_WORDS, 2, 6)

        def mv(type_, fields):
            el = ET.SubElement(root, "MVAttribute", {"type": type_})
            for n, v in fields.items():
                m = ET.SubElement(el, "Meta", {"name": n})
                m.text = v

        for j in range(rng.randint(0, 2)):
            mv("SUBTITLES", {
                "ST_FILENAME": "%s_sub%d.srt" % (stem, j),
                "ST_LANGUAGE_CODES": rng.choice(self.yle_sub_langs),
                "ST_FILE_FORMAT": "",  # MUST stay empty (transform crash)
                "ST_INGEST_DATE": "2019%02d%02d" % (1 + j % 12, 1 + i % 28),
                "ST_PUB_DATE": "" if j % 2 else "2019%02d%02d" % (1 + i % 12, 1 + j % 28),
            })
        for j in range(rng.randint(0, 2)):
            mv("AUDIO", {
                "PMA_CODEC": rng.choice(["PCM", "AAC"]),
                "PMA_LANGUAGE": rng.choice(self.yle_audio_langs),
                "PMA_SAMPLE_RATE": rng.choice(["44100", "48000"]),
                "PMA_NOTES": "" if j % 2 else "stereo",
            })
        for j in range(rng.randint(0, 3)):
            mv("PUBLICATIONS", {
                "PUB_ID": "PUB%05d-%d" % (i, j),
                "PUB_DATETIME": "2019%02d%02d%02d0000" % (
                    1 + i % 12, 1 + (i + j) % 28, (10 + j) % 24
                ),
                "PUB_DATETIME_END": "" if j == 1 else "2019%02d%02d%02d3000" % (
                    1 + i % 12, 1 + (i + j) % 28, (10 + j) % 24
                ),
                "PUB_CHANNEL": rng.choice(self.yle_channels),
            })
        for j in range(rng.randint(0, 3)):
            name = "" if (i + j) % 7 == 6 else _person(rng)
            mv("CONTRIBUTORS", {
                "CONT_PERSON_NAME": name,
                "CONT_PERSON_ROLE": ""
                if j % 3 == 2 else rng.choice(self.yle_role_ids),
            })

        payload = ET.tostring(root, encoding="utf-8", xml_declaration=True)
        return stem, payload

    def build_yle(self, n_docs, n_datasets=1, write_files=True):
        per_ds = max(1, n_docs // n_datasets)
        for i in range(n_docs):
            ds = "d%d" % min(i // per_ds, n_datasets - 1)
            stem, payload = self._yle_doc(i)
            self.yle_stems.append(stem)
            fname = stem + ".xml"
            if write_files:
                path = os.path.join(self.out, "yle", ds, fname)
                os.makedirs(os.path.dirname(path), exist_ok=True)
                with open(path, "wb") as fh:
                    fh.write(payload)
            self._add_page("yle", ds, fname, 0, payload, "fi")

    # ------------------------------------------------------------------
    # ASR subtitles (Vocapia XML)
    # ------------------------------------------------------------------
    def build_asr(self, n_files, write_files=True):
        rng = self.rng
        # target LD program ids; non-R ids resolve, R ids exercise the
        # KeyError skip (pa_converter.py:649-664) [Q]
        non_r = [x for x in self.ld_ids if not x.startswith("R")]
        r_ids = [x for x in self.ld_ids if x.startswith("R")]
        targets = non_r[: max(1, n_files - 1)] + r_ids[:1]
        for t, pid in enumerate(targets):
            root = ET.Element("root")
            spk_list = ET.SubElement(root, "SpeakerList")
            n_spk = rng.randint(1, 3)
            for s in range(n_spk):
                ET.SubElement(spk_list, "Speaker", {
                    "spkid": "S%d" % (s + 1),
                    "gender": rng.choice(["1", "2"]),
                    "lang": "fre",
                    "nw": str(rng.randint(10, 500)),
                })
            seg_list = ET.SubElement(root, "SegmentList")
            t0 = 0.0
            for k in range(rng.randint(1, 5)):
                dur = rng.randint(10, 90) / 10.0
                seg = ET.SubElement(seg_list, "SpeechSegment", {
                    "lang": "fre",
                    "spkid": "S%d" % rng.randint(1, n_spk),
                    "stime": repr(round(t0, 1)),
                    "etime": repr(round(t0 + dur, 1)),
                })
                t0 += dur + 0.5
                if k == 3:
                    w = ET.SubElement(seg, "Word")
                    w.text = "  "  # empty content -> row skipped [Q]
                    continue
                words = ["l'", "avion"] if k == 1 else _words(
                    rng, SUMMARY_WORDS, 2, 6
                ).split()
                for word in words:
                    w = ET.SubElement(seg, "Word")
                    w.text = " %s " % word
            payload = ET.tostring(root, encoding="utf-8", xml_declaration=True)
            fname = pid + ".xml"
            if write_files:
                path = os.path.join(self.out, "asr", fname)
                os.makedirs(os.path.dirname(path), exist_ok=True)
                with open(path, "wb") as fh:
                    fh.write(payload)
            self._add_page("asr", "", fname, 0, payload, "fr")

    # ------------------------------------------------------------------
    # Flow mapping JSON
    # ------------------------------------------------------------------
    def build_flow(self, write_files=True):
        entries = []
        non_r_ld = [x for x in self.ld_ids if not x.startswith("R")]
        r_ld = [x for x in self.ld_ids if x.startswith("R")]
        for pid in non_r_ld[:6]:
            entries.append({"name": pid + ".mp4",
                            "flowHRef": "https://flow.example/ld/" + pid})
        for pid in non_r_ld[6:8]:
            entries.append({"name": "R" + pid + ".mp4",
                            "flowHRef": "https://flow.example/ldr/" + pid})
        for pid in r_ld[:3]:  # fallback 'R'+identifier path [Q]
            entries.append({"name": pid[1:] + ".mp4",
                            "flowHRef": "https://flow.example/ldf/" + pid})
        pa_progs = [x for x in self.pa_ids if x.count("_") == 1]
        for pid in [x for x in pa_progs if not x.startswith("R")][:3]:
            entries.append({"name": pid + ".mp4",
                            "flowHRef": "https://flow.example/pa/" + pid})
        for pid in [x for x in pa_progs if x.startswith("R")][:3]:
            entries.append({"name": pid + ".mp4",
                            "flowHRef": "https://flow.example/par/" + pid})
        for stem in self.yle_stems[:4]:
            entries.append({"name": stem + ".mp4",
                            "flowHRef": "https://flow.example/yle/" + stem})
        for stem in self.yle_stems[4:6]:  # MEDIA->PROG: matches, no triples [Q]
            entries.append({
                "name": stem.replace("PROG", "MEDIA") + ".mov",
                "flowHRef": "https://flow.example/ylem/" + stem,
            })
        entries.append({"name": "Political Debates",
                        "flowHRef": "https://flow.example/noext"})
        entries.append({"name": "UNKNOWN99.mp4",
                        "flowHRef": "https://flow.example/unmatched"})

        if write_files:
            with open(os.path.join(self.out, "file_flow_mapping.json"), "w",
                      encoding="utf-8") as fh:
                json.dump(entries, fh, ensure_ascii=False, indent=1)
        for n, obj in enumerate(entries):
            payload = json.dumps(obj, ensure_ascii=False).encode("utf-8")
            self._add_page("flow", "", "file_flow_mapping.json", n, payload, "fr")

    # ------------------------------------------------------------------
    def _write_csv(self, rel, header, rows):
        path = os.path.join(self.out, rel)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w", encoding="latin-1", newline="") as fh:
            w = csv.writer(fh, delimiter=";", lineterminator="\n")
            w.writerow(header)
            w.writerows(rows)

    def write_web_pages(self, n_files: int = 1):
        """Write the web_pages parquet; ``n_files > 1`` interleaves
        rows round-robin across files so Spark gets balanced input
        splits at bench scale (one file caps scan parallelism)."""
        cols = list(zip(*self.pages))
        table = pa.table(
            {
                "url": pa.array(cols[0], pa.string()),
                "warc_ts": pa.array(cols[1], pa.timestamp("us")),
                "html": pa.array(cols[2], pa.binary()),
                "text": pa.array(cols[3], pa.string()),
                "lang": pa.array(cols[4], pa.string()),
            }
        )
        out = os.path.join(self.out, "web_pages")
        os.makedirs(out, exist_ok=True)
        if n_files <= 1:
            pq.write_table(table, os.path.join(out, "part-0.parquet"))
        else:
            import numpy as np

            idx = np.arange(table.num_rows)
            for f in range(n_files):
                part = table.take(idx[idx % n_files == f])
                pq.write_table(
                    part, os.path.join(out, "part-%05d.parquet" % f)
                )
        return out


def build_corpus(out_dir, n_ld=30, n_pa=20, n_yle=12, n_asr=6,
                 seed=42, write_reference_layout=True, n_files=1):
    """Build the full corpus; returns the CorpusBuilder."""
    b = CorpusBuilder(out_dir, seed=seed)
    b.build_ld(n_ld, write_files=write_reference_layout)
    b.build_pa(n_pa, write_files=write_reference_layout)
    b.build_yle(n_yle, write_files=write_reference_layout)
    b.build_asr(n_asr, write_files=write_reference_layout)
    b.build_flow(write_files=write_reference_layout)
    b.write_web_pages(n_files=n_files)
    return b


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--n-ld", type=int, default=30)
    ap.add_argument("--n-pa", type=int, default=20)
    ap.add_argument("--n-yle", type=int, default=12)
    ap.add_argument("--n-asr", type=int, default=6)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--no-reference-layout", action="store_true")
    args = ap.parse_args()
    build_corpus(
        args.out_dir, n_ld=args.n_ld, n_pa=args.n_pa, n_yle=args.n_yle,
        n_asr=args.n_asr, seed=args.seed,
        write_reference_layout=not args.no_reference_layout,
    )
    print("corpus written to", args.out_dir)
