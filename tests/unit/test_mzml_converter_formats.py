"""Real-converter mzML compatibility.

Fixtures here are built byte-by-byte in msconvert's output shape —
``indexedmzML`` wrapper, trailing byte-offset index, zlib-compressed
64-bit arrays, chromatogramList, minute-unit scan times — independent of
``alphadia_tpu.testing.mzml_writer`` so a shared wrong assumption in the
engine's own writer can't hide a parser bug.
(reference ingestion contract: alphadia/raw_data/alpharaw_wrapper.py:20-180)
"""

import base64
import struct
import zlib

import numpy as np
import pytest

from alphadia_tpu.rawdata.mzml import read_mzml


def _b64(values, dtype, compress):
    raw = np.asarray(values, dtype).tobytes()
    if compress:
        raw = zlib.compress(raw)
    return base64.b64encode(raw).decode()


def _binary_array(values, kind, dtype=np.float64, compress=True, extra_cv=""):
    acc_dtype = (
        '<cvParam cvRef="MS" accession="MS:1000523" name="64-bit float"/>'
        if dtype == np.float64
        else '<cvParam cvRef="MS" accession="MS:1000521" name="32-bit float"/>'
    )
    acc_comp = (
        '<cvParam cvRef="MS" accession="MS:1000574" name="zlib compression"/>'
        if compress
        else '<cvParam cvRef="MS" accession="MS:1000576" name="no compression"/>'
    )
    kinds = {
        "mz": '<cvParam cvRef="MS" accession="MS:1000514" name="m/z array" unitCvRef="MS" unitAccession="MS:1000040" unitName="m/z"/>',
        "intensity": '<cvParam cvRef="MS" accession="MS:1000515" name="intensity array" unitCvRef="MS" unitAccession="MS:1000131" unitName="number of detector counts"/>',
        "mobility": '<cvParam cvRef="MS" accession="MS:1002816" name="mean inverse reduced ion mobility array" unitCvRef="MS" unitAccession="MS:1002814" unitName="volt-second per square centimeter"/>',
    }
    b = _b64(values, dtype, compress)
    return (
        f'<binaryDataArray encodedLength="{len(b)}">'
        f"{acc_dtype}{acc_comp}{kinds[kind]}{extra_cv}"
        f"<binary>{b}</binary></binaryDataArray>"
    )


def _spectrum(
    idx,
    rt_min,
    ms_level,
    mz,
    inten,
    iso=None,
    mobility=None,
    scan_mobility=None,
    rt_unit="minute",
):
    """One msconvert-shaped <spectrum> element."""
    unit_acc = "UO:0000031" if rt_unit == "minute" else "UO:0000010"
    level_cv = (
        f'<cvParam cvRef="MS" accession="MS:1000511" name="ms level" value="{ms_level}"/>'
        '<cvParam cvRef="MS" accession="MS:1000127" name="centroid spectrum" value=""/>'
    )
    scan_cvs = (
        f'<cvParam cvRef="MS" accession="MS:1000016" name="scan start time" '
        f'value="{rt_min}" unitCvRef="UO" unitAccession="{unit_acc}" unitName="{rt_unit}"/>'
    )
    if scan_mobility is not None:
        scan_cvs += (
            f'<cvParam cvRef="MS" accession="MS:1002815" '
            f'name="inverse reduced ion mobility" value="{scan_mobility}" '
            'unitCvRef="MS" unitAccession="MS:1002814"/>'
        )
    precursor = ""
    if iso is not None:
        target, lo_off, hi_off = iso
        precursor = (
            "<precursorList count=\"1\"><precursor><isolationWindow>"
            f'<cvParam cvRef="MS" accession="MS:1000827" name="isolation window target m/z" value="{target}" unitCvRef="MS" unitAccession="MS:1000040"/>'
            f'<cvParam cvRef="MS" accession="MS:1000828" name="isolation window lower offset" value="{lo_off}" unitCvRef="MS" unitAccession="MS:1000040"/>'
            f'<cvParam cvRef="MS" accession="MS:1000829" name="isolation window upper offset" value="{hi_off}" unitCvRef="MS" unitAccession="MS:1000040"/>'
            "</isolationWindow><selectedIonList count=\"1\"><selectedIon>"
            f'<cvParam cvRef="MS" accession="MS:1000744" name="selected ion m/z" value="{target}" unitCvRef="MS" unitAccession="MS:1000040"/>'
            "</selectedIon></selectedIonList><activation>"
            '<cvParam cvRef="MS" accession="MS:1000422" name="beam-type collision-induced dissociation" value=""/>'
            "</activation></precursor></precursorList>"
        )
    arrays = _binary_array(mz, "mz", np.float64, True) + _binary_array(
        inten, "intensity", np.float64, True
    )
    n_arr = 2
    if mobility is not None:
        arrays += _binary_array(mobility, "mobility", np.float64, True)
        n_arr = 3
    return (
        f'<spectrum index="{idx}" id="controllerType=0 controllerNumber=1 scan={idx + 1}" defaultArrayLength="{len(mz)}">'
        f"{level_cv}{precursor}"
        f'<scanList count="1"><cvParam cvRef="MS" accession="MS:1000795" name="no combination" value=""/>'
        f"<scan>{scan_cvs}</scan></scanList>"
        f'<binaryDataArrayList count="{n_arr}">{arrays}</binaryDataArrayList>'
        "</spectrum>"
    )


def _indexed_mzml(spectra_xml):
    """Wrap spectra in the full indexedmzML document msconvert emits,
    including a (synthetic) byte-offset index and a TIC chromatogram."""
    body = (
        '<mzML xmlns="http://psi.hupo.org/ms/mzml" '
        'xmlns:xsi="http://www.w3.org/2001/XMLSchema-instance" '
        'xsi:schemaLocation="http://psi.hupo.org/ms/mzml http://psidev.info/files/ms/mzML/xsd/mzML1.1.0.xsd" '
        'id="test" version="1.1.0">'
        '<cvList count="2">'
        '<cv id="MS" fullName="Proteomics Standards Initiative Mass Spectrometry Ontology" version="4.1.0" URI="https://raw.githubusercontent.com/HUPO-PSI/psi-ms-CV/master/psi-ms.obo"/>'
        '<cv id="UO" fullName="Unit Ontology" version="09:04:2014" URI="https://raw.githubusercontent.com/bio-ontology-research-group/unit-ontology/master/unit.obo"/>'
        "</cvList>"
        '<fileDescription><fileContent><cvParam cvRef="MS" accession="MS:1000580" name="MSn spectrum" value=""/></fileContent></fileDescription>'
        '<softwareList count="1"><software id="pwiz" version="3.0.23"><cvParam cvRef="MS" accession="MS:1000615" name="ProteoWizard software" value=""/></software></softwareList>'
        '<instrumentConfigurationList count="1"><instrumentConfiguration id="IC1"><cvParam cvRef="MS" accession="MS:1000031" name="instrument model" value=""/></instrumentConfiguration></instrumentConfigurationList>'
        '<dataProcessingList count="1"><dataProcessing id="pwiz_conversion"><processingMethod order="0" softwareRef="pwiz"><cvParam cvRef="MS" accession="MS:1000544" name="Conversion to mzML" value=""/></processingMethod></dataProcessing></dataProcessingList>'
        f'<run id="run1" defaultInstrumentConfigurationRef="IC1">'
        f'<spectrumList count="{len(spectra_xml)}" defaultDataProcessingRef="pwiz_conversion">'
        + "".join(spectra_xml)
        + "</spectrumList>"
        '<chromatogramList count="1" defaultDataProcessingRef="pwiz_conversion">'
        '<chromatogram index="0" id="TIC" defaultArrayLength="0">'
        '<cvParam cvRef="MS" accession="MS:1000235" name="total ion current chromatogram" value=""/>'
        '<binaryDataArrayList count="2">'
        + _binary_array([], "mz", np.float64, True)
        + _binary_array([], "intensity", np.float64, True)
        + "</binaryDataArrayList></chromatogram></chromatogramList>"
        "</run></mzML>"
    )
    offsets = []
    pos = 0
    while True:
        pos = body.find("<spectrum ", pos)
        if pos < 0:
            break
        offsets.append(pos)
        pos += 1
    index = (
        f'<indexList count="1"><index name="spectrum">'
        + "".join(
            f'<offset idRef="controllerType=0 controllerNumber=1 scan={i + 1}">{off}</offset>'
            for i, off in enumerate(offsets)
        )
        + "</index></indexList>"
    )
    return (
        '<?xml version="1.0" encoding="utf-8"?>\n'
        '<indexedmzML xmlns="http://psi.hupo.org/ms/mzml" '
        'xmlns:xsi="http://www.w3.org/2001/XMLSchema-instance" '
        'xsi:schemaLocation="http://psi.hupo.org/ms/mzml http://psidev.info/files/ms/mzML/xsd/mzML1.1.1_idx.xsd">'
        + body
        + index
        + "<indexListOffset>0</indexListOffset>"
        "<fileChecksum>0000000000000000000000000000000000000000</fileChecksum>"
        "</indexedmzML>"
    )


def test_indexed_mzml_zlib_f64(tmp_path):
    """msconvert-shaped indexedmzML with zlib + 64-bit arrays parses
    byte-for-byte, skipping index and chromatograms."""
    mz1 = [400.12, 500.5, 900.9]
    it1 = [100.0, 250.0, 50.0]
    mz2 = [410.0, 405.0, 600.0]  # deliberately unsorted
    it2 = [10.0, 20.0, 30.0]
    doc = _indexed_mzml(
        [
            _spectrum(0, 0.5, 1, mz1, it1),
            _spectrum(1, 0.51, 2, mz2, it2, iso=(412.5, 12.5, 12.5)),
        ]
    )
    p = tmp_path / "run.mzML"
    p.write_bytes(doc.encode())
    out = read_mzml(p)
    assert out.n_spectra == 2
    assert out.ms_level.tolist() == [1, 2]
    np.testing.assert_allclose(out.rt, [30.0, 30.6], rtol=1e-6)
    assert out.isolation_lower_mz[0] == -1.0
    np.testing.assert_allclose(out.isolation_lower_mz[1], 400.0)
    np.testing.assert_allclose(out.isolation_upper_mz[1], 425.0)
    # peaks sorted ascending within each spectrum
    np.testing.assert_allclose(out.mz[out.peak_start_idx[1] : out.peak_stop_idx[1]],
                               [405.0, 410.0, 600.0])
    np.testing.assert_allclose(
        out.intensity[out.peak_start_idx[1] : out.peak_stop_idx[1]],
        [20.0, 10.0, 30.0],
    )
    assert out.mobility is None


def test_second_unit_scan_times(tmp_path):
    doc = _indexed_mzml([_spectrum(0, 42.0, 1, [500.0], [1.0], rt_unit="second")])
    p = tmp_path / "sec.mzML"
    p.write_bytes(doc.encode())
    out = read_mzml(p)
    np.testing.assert_allclose(out.rt, [42.0])


def test_per_peak_mobility_array(tmp_path):
    """Bruker-style per-peak mobility binary array (MS:1002816)."""
    mz = [500.0, 501.0, 502.0]
    it = [1.0, 2.0, 3.0]
    mob = [1.1, 0.9, 1.0]
    doc = _indexed_mzml(
        [_spectrum(0, 1.0, 2, mz, it, iso=(505.0, 10.0, 10.0), mobility=mob)]
    )
    p = tmp_path / "mob.mzML"
    p.write_bytes(doc.encode())
    out = read_mzml(p)
    assert out.has_mobility
    np.testing.assert_allclose(out.mobility, [1.1, 0.9, 1.0])


def test_scan_level_mobility_broadcast(tmp_path):
    """timsconvert frame-split layout: one scan-level inverse reduced
    mobility cvParam per spectrum, broadcast over its peaks."""
    doc = _indexed_mzml(
        [
            _spectrum(0, 1.0, 2, [500.0, 510.0], [1.0, 2.0],
                      iso=(505.0, 10.0, 10.0), scan_mobility=0.85),
            _spectrum(1, 1.0, 2, [500.0], [3.0],
                      iso=(505.0, 10.0, 10.0), scan_mobility=0.95),
        ]
    )
    p = tmp_path / "tims.mzML"
    p.write_bytes(doc.encode())
    out = read_mzml(p)
    assert out.has_mobility
    np.testing.assert_allclose(out.mobility, [0.85, 0.85, 0.95])


def test_numpress_mzml_decodes(tmp_path):
    """msconvert `--numpressLinear --numpressSlof` layout: numpress-linear
    m/z (plain and +zlib) and numpress-slof intensities parse to the
    original arrays within codec tolerance."""
    from alphadia_tpu.rawdata.numpress import encode_linear, encode_slof

    mz1 = np.sort(np.random.default_rng(3).uniform(400.0, 1200.0, 64))
    it1 = np.random.default_rng(4).uniform(1.0, 1e6, 64)

    def _np_array(payload, acc, name, kind_cv):
        b = base64.b64encode(payload).decode()
        return (
            f'<binaryDataArray encodedLength="{len(b)}">'
            f'<cvParam cvRef="MS" accession="{acc}" name="{name}"/>'
            f"{kind_cv}<binary>{b}</binary></binaryDataArray>"
        )

    mz_cv = '<cvParam cvRef="MS" accession="MS:1000514" name="m/z array"/>'
    it_cv = '<cvParam cvRef="MS" accession="MS:1000515" name="intensity array"/>'
    specs = []
    for idx, (mz_acc, mz_payload) in enumerate(
        [
            ("MS:1002312", encode_linear(mz1)),
            ("MS:1002746", zlib.compress(encode_linear(mz1))),
        ]
    ):
        specs.append(
            f'<spectrum index="{idx}" id="scan={idx + 1}" defaultArrayLength="64">'
            '<cvParam cvRef="MS" accession="MS:1000511" name="ms level" value="1"/>'
            '<cvParam cvRef="MS" accession="MS:1000127" name="centroid spectrum"/>'
            "<scanList count=\"1\"><scan>"
            '<cvParam cvRef="MS" accession="MS:1000016" name="scan start time" '
            f'value="{0.5 + idx / 100}" unitAccession="UO:0000031" unitName="minute"/>'
            "</scan></scanList>"
            '<binaryDataArrayList count="2">'
            + _np_array(mz_payload, mz_acc, "MS-Numpress linear prediction compression", mz_cv)
            + _np_array(encode_slof(it1), "MS:1002314",
                        "MS-Numpress short logged float compression", it_cv)
            + "</binaryDataArrayList></spectrum>"
        )
    # writer variant: a PLAIN numpress accession plus a SEPARATE zlib
    # cvParam (either order) instead of the combined +zlib term
    zlib_cv = '<cvParam cvRef="MS" accession="MS:1000574" name="zlib compression"/>'
    specs.append(
        '<spectrum index="2" id="scan=3" defaultArrayLength="64">'
        '<cvParam cvRef="MS" accession="MS:1000511" name="ms level" value="1"/>'
        '<cvParam cvRef="MS" accession="MS:1000127" name="centroid spectrum"/>'
        "<scanList count=\"1\"><scan>"
        '<cvParam cvRef="MS" accession="MS:1000016" name="scan start time" '
        'value="0.53" unitAccession="UO:0000031" unitName="minute"/>'
        "</scan></scanList>"
        '<binaryDataArrayList count="2">'
        + _np_array(zlib.compress(encode_linear(mz1)), "MS:1002312",
                    "MS-Numpress linear prediction compression", zlib_cv + mz_cv)
        + _np_array(zlib.compress(encode_slof(it1)), "MS:1002314",
                    "MS-Numpress short logged float compression", it_cv + zlib_cv)
        + "</binaryDataArrayList></spectrum>"
    )
    doc = _indexed_mzml([]).replace("</spectrumList>", "".join(specs) + "</spectrumList>")
    p = tmp_path / "np.mzML"
    p.write_bytes(doc.encode())
    out = read_mzml(p)
    assert out.n_spectra == 3
    for i in range(3):
        sl = slice(out.peak_start_idx[i], out.peak_stop_idx[i])
        np.testing.assert_allclose(out.mz[sl], mz1, atol=1e-5)
        np.testing.assert_allclose(out.intensity[sl], it1, rtol=5e-4, atol=0.5)


def test_empty_spectrum_and_uncompressed_f32(tmp_path):
    """Zero-length arrays and uncompressed 32-bit floats both parse."""
    empty = _spectrum(0, 0.1, 1, [], [])
    f32 = (
        '<spectrum index="1" id="scan=2" defaultArrayLength="2">'
        '<cvParam cvRef="MS" accession="MS:1000511" name="ms level" value="1"/>'
        '<scanList count="1"><scan>'
        '<cvParam cvRef="MS" accession="MS:1000016" name="scan start time" value="0.2" unitName="minute"/>'
        "</scan></scanList>"
        '<binaryDataArrayList count="2">'
        + _binary_array([100.0, 200.0], "mz", np.float32, False)
        + _binary_array([5.0, 6.0], "intensity", np.float32, False)
        + "</binaryDataArrayList></spectrum>"
    )
    doc = _indexed_mzml([empty])
    doc = doc.replace("</spectrumList>", f32 + "</spectrumList>")
    p = tmp_path / "mixed.mzML"
    p.write_bytes(doc.encode())
    out = read_mzml(p)
    assert out.n_spectra == 2
    assert out.peak_stop_idx[0] - out.peak_start_idx[0] == 0
    np.testing.assert_allclose(out.mz[out.peak_start_idx[1] : out.peak_stop_idx[1]],
                               [100.0, 200.0])
