"""ALTO v3 XML rendering of a page tree.

Parity: /root/reference/server/src/utils/export.py:943-984 (``export_alto``) —
TextBlock per paragraph, TextLine per line with a document-global line
counter, String per word with int-truncated HPOS/VPOS/WIDTH/HEIGHT.

Note: the reference's final template string is missing its ``f`` prefix, so
its exporter emits the literal text ``{blocks}`` instead of the content
(export.py:961-977). We implement the evident intent (substituting the blocks
and source name) and additionally XML-escape CONTENT, which the reference
omits.
"""

from __future__ import annotations

from xml.sax.saxutils import quoteattr


def page_to_alto(tree: list, source_name: str = "") -> str:
    line_count = 0
    word_count = 0
    blocks = []
    for par_id, paragraph in enumerate(tree):
        blocks.append(f'\t\t\t\t\t<TextBlock ID="block_{par_id}">\n')
        for line in paragraph:
            blocks.append(f'\t\t\t\t\t\t<TextLine ID="line_{line_count}">\n')
            for word in line:
                box = word["box"]
                blocks.append(
                    f'\t\t\t\t\t\t\t<String ID="word_{word_count}"'
                    f' HPOS="{int(box[0])}" VPOS="{int(box[1])}"'
                    f' WIDTH="{int(box[2] - box[0])}" HEIGHT="{int(box[3] - box[1])}"'
                    f" CONTENT={quoteattr(word['text'])}/>\n"
                )
                word_count += 1
            blocks.append("\t\t\t\t\t\t</TextLine>\n")
            line_count += 1
        blocks.append("\t\t\t\t\t</TextBlock>\n")
    body = "".join(blocks)

    return f"""<?xml version="1.0" encoding="UTF-8"?>
<alto xmlns="http://www.loc.gov/standards/alto/ns-v3#" xmlns:xlink="http://www.w3.org/1999/xlink" xmlns:xsi="http://www.w3.org/2001/XMLSchema-instance" xsi:schemaLocation="http://www.loc.gov/standards/alto/ns-v3# http://www.loc.gov/alto/v3/alto-3-0.xsd">
    <Description>
        <MeasurementUnit>pixel</MeasurementUnit>
        <sourceImageInformation>
            <fileName>{source_name}</fileName>
        </sourceImageInformation>
    </Description>
    <Layout>
        <Page ID="page_0">
            <PrintSpace>
                <ComposedBlock ID="composed_block_0">
{body}                </ComposedBlock>
            </PrintSpace>
        </Page>
    </Layout>
</alto>"""
