import math

import pyarrow as pa

from pdf_to_text_ray.stages.segment import (
    block_total,
    chunk_blocks,
    extract_blocks,
    parse_block_records,
    records_batch,
    records_to_csv,
    segment_batch,
)

BLOCK = (
    "Sucursal 0042 - Goya\n"
    "8412345678905 2 24.95\n"
    "8498765432101 1 24.95\n"
    "* Total importe en la sucursal: 74.85"
)


def test_basic_block():
    text = "preamble line\n" + BLOCK + "\ntrailing noise"
    blocks = extract_blocks(text)
    assert blocks == [BLOCK]


def test_block_at_line_zero_and_unterminated():
    # unterminated trailing block still emitted (main.ts:103-106)
    text = "Sucursal 1 - A\n8412345678905 1 5.00"
    assert extract_blocks(text) == [text]
    assert math.isnan(block_total(text))


def test_consecutive_sucursal_flush():
    # a new "Sucursal" line flushes the in-progress block (main.ts:81-83)
    text = "Sucursal 1 - A\n8412345678905 1 5.00\nSucursal 2 - B\n* Total importe en la sucursal: 0"
    blocks = extract_blocks(text)
    assert len(blocks) == 2
    assert blocks[0] == "Sucursal 1 - A\n8412345678905 1 5.00"
    assert blocks[1].startswith("Sucursal 2 - B")


def test_case_insensitive_markers():
    # main.ts:79 (startsWith lowercase) and main.ts:94 (/i regex)
    text = "sUcursal X\n* TOTAL IMPORTE EN LA SUCURSAL: 10\nafter"
    blocks = extract_blocks(text)
    assert blocks == ["sUcursal X\n* TOTAL IMPORTE EN LA SUCURSAL: 10"]
    assert block_total(blocks[0]) == 10.0


def test_total_without_decimals():
    assert block_total("Sucursal A\n* Total importe en la sucursal: 50") == 50.0


def test_records_and_coercion():
    recs = parse_block_records(BLOCK)
    assert recs == [
        ("0042 - Goya", "8412345678905", 2, 24.95),
        ("0042 - Goya", "8498765432101", 1, 24.95),
    ]


def test_zero_sale_lines():
    assert parse_block_records("Sucursal E\n* Total importe en la sucursal: 0") == []


def test_chunking_parity():
    blocks = [str(i) for i in range(23)]
    chunks = chunk_blocks(blocks, 10)
    assert [len(c) for c in chunks] == [10, 10, 3]


def test_csv_parity():
    csv = records_to_csv([("A", "123", 2, 24.95), ("B", "456", 0, 0.0)])
    assert csv == (
        "SucursalName,EAN,CantidadVendida,Importe\n"
        '"A","123",2,24.95\n'
        '"B","456",0,0.00'
    )


def test_batch_explode():
    t = pa.table({
        "url": ["u1", "u2"],
        "text_extracted": [BLOCK + "\n" + BLOCK.replace("0042", "0043"), "no blocks here"],
    })
    blocks = segment_batch(t)
    assert blocks.num_rows == 2
    assert blocks["url"].to_pylist() == ["u1", "u1"]
    assert blocks["block_idx"].to_pylist() == [0, 1]
    recs = records_batch(blocks)
    assert recs.num_rows == 4
    assert recs["record_idx"].to_pylist() == [0, 1, 0, 1]
    assert recs["cantidad"].to_pylist() == [2, 1, 2, 1]


def test_block_spans_invariant():
    from pdf_to_text_ray.stages.segment import extract_blocks_with_spans

    text = "preamble\n" + BLOCK + "\nmid noise\n" + BLOCK.replace("0042", "0099")
    spans = extract_blocks_with_spans(text)
    assert [s[0] for s in spans] == extract_blocks(text)
    for blk, start, end in spans:
        assert text[start:end] == blk  # the span contract


def test_segment_batch_spans():
    t = pa.table({
        "url": ["u1"],
        "text_extracted": ["x\n" + BLOCK + "\ny"],
    })
    out = segment_batch(t)
    s, e = out["block_start"][0].as_py(), out["block_end"][0].as_py()
    assert t["text_extracted"][0].as_py()[s:e] == out["block_text"][0].as_py()
