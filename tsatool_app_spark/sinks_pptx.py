"""Dependency-free minimal .pptx writer (S7).

The reference renders one slide per condition into ``report_template.pptx``
with python-pptx (/root/reference/tsa/cond_collection.py:257-401): title,
condition text, analysis time range, a validity table, error list, and the
timeline image. python-pptx is absent in this container; pptx is a zip of
ECMA-376 PresentationML XML parts, so this module writes the needed subset
directly:

- one slide master / layout / theme (minimal but schema-complete);
- per slide: a title shape, body text lines, an optional real table
  (``a:tbl``), and an optional embedded PNG picture (the S8 timeline).

Driver-side: a deck is one slide per condition — O(conditions) cells.
"""

from __future__ import annotations

import zipfile
from xml.sax.saxutils import escape

EMU_PER_PX = 9525  # 96 dpi

_A = 'xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main"'
_P = 'xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main"'
_R = 'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"'

_CONTENT_TYPES_TMPL = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Default Extension="png" ContentType="image/png"/>
<Override PartName="/ppt/presentation.xml" ContentType="application/vnd.openxmlformats-officedocument.presentationml.presentation.main+xml"/>
<Override PartName="/ppt/slideMasters/slideMaster1.xml" ContentType="application/vnd.openxmlformats-officedocument.presentationml.slideMaster+xml"/>
<Override PartName="/ppt/slideLayouts/slideLayout1.xml" ContentType="application/vnd.openxmlformats-officedocument.presentationml.slideLayout+xml"/>
<Override PartName="/ppt/theme/theme1.xml" ContentType="application/vnd.openxmlformats-officedocument.theme+xml"/>
{slide_overrides}
</Types>"""

_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="ppt/presentation.xml"/>
</Relationships>"""

# Minimal-but-complete theme: clrScheme + fontScheme + the three mandatory
# style lists of fmtScheme.
_THEME = f"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<a:theme {_A} name="min"><a:themeElements>
<a:clrScheme name="min"><a:dk1><a:sysClr val="windowText" lastClr="000000"/></a:dk1>
<a:lt1><a:sysClr val="window" lastClr="FFFFFF"/></a:lt1>
<a:dk2><a:srgbClr val="44546A"/></a:dk2><a:lt2><a:srgbClr val="E7E6E6"/></a:lt2>
<a:accent1><a:srgbClr val="2B83BA"/></a:accent1><a:accent2><a:srgbClr val="F03B20"/></a:accent2>
<a:accent3><a:srgbClr val="BABABA"/></a:accent3><a:accent4><a:srgbClr val="FFC000"/></a:accent4>
<a:accent5><a:srgbClr val="5B9BD5"/></a:accent5><a:accent6><a:srgbClr val="70AD47"/></a:accent6>
<a:hlink><a:srgbClr val="0563C1"/></a:hlink><a:folHlink><a:srgbClr val="954F72"/></a:folHlink></a:clrScheme>
<a:fontScheme name="min"><a:majorFont><a:latin typeface="Calibri"/><a:ea typeface=""/><a:cs typeface=""/></a:majorFont>
<a:minorFont><a:latin typeface="Calibri"/><a:ea typeface=""/><a:cs typeface=""/></a:minorFont></a:fontScheme>
<a:fmtScheme name="min">
<a:fillStyleLst><a:solidFill><a:schemeClr val="phClr"/></a:solidFill><a:solidFill><a:schemeClr val="phClr"/></a:solidFill><a:solidFill><a:schemeClr val="phClr"/></a:solidFill></a:fillStyleLst>
<a:lnStyleLst><a:ln w="6350"><a:solidFill><a:schemeClr val="phClr"/></a:solidFill></a:ln><a:ln w="12700"><a:solidFill><a:schemeClr val="phClr"/></a:solidFill></a:ln><a:ln w="19050"><a:solidFill><a:schemeClr val="phClr"/></a:solidFill></a:ln></a:lnStyleLst>
<a:effectStyleLst><a:effectStyle><a:effectLst/></a:effectStyle><a:effectStyle><a:effectLst/></a:effectStyle><a:effectStyle><a:effectLst/></a:effectStyle></a:effectStyleLst>
<a:bgFillStyleLst><a:solidFill><a:schemeClr val="phClr"/></a:solidFill><a:solidFill><a:schemeClr val="phClr"/></a:solidFill><a:solidFill><a:schemeClr val="phClr"/></a:solidFill></a:bgFillStyleLst>
</a:fmtScheme></a:themeElements></a:theme>"""

_SLIDE_MASTER = f"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<p:sldMaster {_P} {_A} {_R}>
<p:cSld><p:spTree><p:nvGrpSpPr><p:cNvPr id="1" name=""/><p:cNvGrpSpPr/><p:nvPr/></p:nvGrpSpPr>
<p:grpSpPr><a:xfrm><a:off x="0" y="0"/><a:ext cx="0" cy="0"/><a:chOff x="0" y="0"/><a:chExt cx="0" cy="0"/></a:xfrm></p:grpSpPr>
</p:spTree></p:cSld>
<p:clrMap bg1="lt1" tx1="dk1" bg2="lt2" tx2="dk2" accent1="accent1" accent2="accent2" accent3="accent3" accent4="accent4" accent5="accent5" accent6="accent6" hlink="hlink" folHlink="folHlink"/>
<p:sldLayoutIdLst><p:sldLayoutId id="2147483649" r:id="rId1"/></p:sldLayoutIdLst>
</p:sldMaster>"""

_SLIDE_LAYOUT = f"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<p:sldLayout {_P} {_A} {_R} type="blank">
<p:cSld name="blank"><p:spTree><p:nvGrpSpPr><p:cNvPr id="1" name=""/><p:cNvGrpSpPr/><p:nvPr/></p:nvGrpSpPr>
<p:grpSpPr><a:xfrm><a:off x="0" y="0"/><a:ext cx="0" cy="0"/><a:chOff x="0" y="0"/><a:chExt cx="0" cy="0"/></a:xfrm></p:grpSpPr>
</p:spTree></p:cSld>
<p:clrMapOvr><a:overrideClrMapping bg1="lt1" tx1="dk1" bg2="lt2" tx2="dk2" accent1="accent1" accent2="accent2" accent3="accent3" accent4="accent4" accent5="accent5" accent6="accent6" hlink="hlink" folHlink="folHlink"/></p:clrMapOvr>
</p:sldLayout>"""


def _rels(pairs: list[tuple[str, str, str]]) -> str:
    body = "".join(
        f'<Relationship Id="{rid}" Type="{typ}" Target="{tgt}"/>'
        for rid, typ, tgt in pairs
    )
    return (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        + body
        + "</Relationships>"
    )


_REL_T = "http://schemas.openxmlformats.org/officeDocument/2006/relationships/"


def _textbox(shape_id: int, x: int, y: int, w: int, h: int, lines: list[str], *, size: int = 1400, bold_first: bool = False) -> str:
    paras = []
    for i, line in enumerate(lines):
        b = ' b="1"' if bold_first and i == 0 else ""
        paras.append(
            f'<a:p><a:r><a:rPr lang="en-US" sz="{size}"{b} dirty="0"/>'
            f"<a:t>{escape(line)}</a:t></a:r></a:p>"
        )
    return (
        f'<p:sp><p:nvSpPr><p:cNvPr id="{shape_id}" name="tb{shape_id}"/>'
        "<p:cNvSpPr txBox=\"1\"/><p:nvPr/></p:nvSpPr>"
        f'<p:spPr><a:xfrm><a:off x="{x}" y="{y}"/><a:ext cx="{w}" cy="{h}"/></a:xfrm>'
        '<a:prstGeom prst="rect"><a:avLst/></a:prstGeom></p:spPr>'
        f'<p:txBody><a:bodyPr wrap="square"/><a:lstStyle/>{"".join(paras)}</p:txBody></p:sp>'
    )


def _table(shape_id: int, x: int, y: int, w: int, rows: list[list[str]]) -> str:
    n_cols = max(len(r) for r in rows)
    col_w = w // n_cols
    grid = "".join(f'<a:gridCol w="{col_w}"/>' for _ in range(n_cols))
    trs = []
    for r in rows:
        tcs = []
        for c in range(n_cols):
            txt = escape(str(r[c])) if c < len(r) and r[c] is not None else ""
            tcs.append(
                "<a:tc><a:txBody><a:bodyPr/><a:lstStyle/><a:p><a:r>"
                f'<a:rPr lang="en-US" sz="1200"/><a:t>{txt}</a:t></a:r></a:p>'
                "</a:txBody><a:tcPr/></a:tc>"
            )
        trs.append(f'<a:tr h="274638">{"".join(tcs)}</a:tr>')
    return (
        f'<p:graphicFrame><p:nvGraphicFramePr><p:cNvPr id="{shape_id}" name="tbl{shape_id}"/>'
        "<p:cNvGraphicFramePr/><p:nvPr/></p:nvGraphicFramePr>"
        f'<p:xfrm><a:off x="{x}" y="{y}"/><a:ext cx="{w}" cy="{274638 * len(rows)}"/></p:xfrm>'
        '<a:graphic><a:graphicData uri="http://schemas.openxmlformats.org/drawingml/2006/table">'
        f"<a:tbl><a:tblPr firstRow=\"1\" bandRow=\"1\"/><a:tblGrid>{grid}</a:tblGrid>{''.join(trs)}</a:tbl>"
        "</a:graphicData></a:graphic></p:graphicFrame>"
    )


def _picture(shape_id: int, rid: str, x: int, y: int, w: int, h: int) -> str:
    return (
        f'<p:pic><p:nvPicPr><p:cNvPr id="{shape_id}" name="pic{shape_id}"/>'
        "<p:cNvPicPr/><p:nvPr/></p:nvPicPr>"
        f'<p:blipFill><a:blip r:embed="{rid}"/><a:stretch><a:fillRect/></a:stretch></p:blipFill>'
        f'<p:spPr><a:xfrm><a:off x="{x}" y="{y}"/><a:ext cx="{w}" cy="{h}"/></a:xfrm>'
        '<a:prstGeom prst="rect"><a:avLst/></a:prstGeom></p:spPr></p:pic>'
    )


def _write_slides(
    z: zipfile.ZipFile,
    slides: list[dict],
    layout_target: str,
    media_prefix: str = "image",
) -> None:
    """Write ppt/slides/slideN.xml (+ rels + media) for every slide dict."""
    for i, s in enumerate(slides):
        shapes = [
            _textbox(2, 457200, 274638, 8229600, 548640, [s.get("title", "")],
                     size=2400, bold_first=True),
        ]
        y = 914400
        lines = s.get("lines") or []
        if lines:
            shapes.append(_textbox(3, 457200, y, 8229600, 274638 * len(lines), lines))
            y += 274638 * len(lines) + 137160
        if s.get("table"):
            shapes.append(_table(4, 457200, y, 4114800, s["table"]))
            y += 274638 * len(s["table"]) + 137160
        slide_rels = [("rId1", _REL_T + "slideLayout", layout_target)]
        if s.get("png"):
            media_name = f"ppt/media/{media_prefix}{i + 1}.png"
            z.writestr(media_name, s["png"])
            slide_rels.append(("rId2", _REL_T + "image", f"../media/{media_prefix}{i + 1}.png"))
            shapes.append(_picture(5, "rId2", 457200, y, 8229600, 2057400))
        slide = (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            f"<p:sld {_P} {_A} {_R}><p:cSld><p:spTree>"
            '<p:nvGrpSpPr><p:cNvPr id="1" name=""/><p:cNvGrpSpPr/><p:nvPr/></p:nvGrpSpPr>'
            '<p:grpSpPr><a:xfrm><a:off x="0" y="0"/><a:ext cx="0" cy="0"/>'
            '<a:chOff x="0" y="0"/><a:chExt cx="0" cy="0"/></a:xfrm></p:grpSpPr>'
            + "".join(shapes)
            + "</p:spTree></p:cSld></p:sld>"
        )
        z.writestr(f"ppt/slides/slide{i + 1}.xml", slide)
        z.writestr(f"ppt/slides/_rels/slide{i + 1}.xml.rels", _rels(slide_rels))


def write_pptx_deck(path: str, slides: list[dict], template_path: str | None = None) -> str:
    """Write a deck: one slide per dict with keys

    - ``title``: heading line;
    - ``lines``: body text lines (condition text, time range, errors);
    - ``table``: optional list of rows (list of str) → a real a:tbl;
    - ``png``: optional PNG bytes (the S8 timeline) embedded as a picture.

    With ``template_path``, the template's slideMaster/slideLayout/theme
    parts (and the media/fonts they reference) are cloned into the output
    and the generated slides attach to the template's first layout — a user
    who brands ``report_template.pptx`` keeps their branding (reference
    behavior: cond_collection.py:257-401). Without it, the built-in
    minimal master/theme is used.
    """
    if template_path is not None:
        return _write_pptx_deck_from_template(path, slides, template_path)
    slide_overrides = "\n".join(
        f'<Override PartName="/ppt/slides/slide{i + 1}.xml" '
        'ContentType="application/vnd.openxmlformats-officedocument.presentationml.slide+xml"/>'
        for i in range(len(slides))
    )
    pres_rels = [("rId1", _REL_T + "slideMaster", "slideMasters/slideMaster1.xml")]
    sld_ids = []
    for i in range(len(slides)):
        rid = f"rId{i + 2}"
        pres_rels.append((rid, _REL_T + "slide", f"slides/slide{i + 1}.xml"))
        sld_ids.append(f'<p:sldId id="{256 + i}" r:id="{rid}"/>')
    presentation = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f"<p:presentation {_P} {_A} {_R}>"
        '<p:sldMasterIdLst><p:sldMasterId id="2147483648" r:id="rId1"/></p:sldMasterIdLst>'
        f'<p:sldIdLst>{"".join(sld_ids)}</p:sldIdLst>'
        '<p:sldSz cx="9144000" cy="6858000"/><p:notesSz cx="6858000" cy="9144000"/>'
        "</p:presentation>"
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", _CONTENT_TYPES_TMPL.format(slide_overrides=slide_overrides))
        z.writestr("_rels/.rels", _ROOT_RELS)
        z.writestr("ppt/presentation.xml", presentation)
        z.writestr("ppt/_rels/presentation.xml.rels", _rels(pres_rels))
        z.writestr("ppt/theme/theme1.xml", _THEME)
        z.writestr("ppt/slideMasters/slideMaster1.xml", _SLIDE_MASTER)
        z.writestr(
            "ppt/slideMasters/_rels/slideMaster1.xml.rels",
            _rels([
                ("rId1", _REL_T + "slideLayout", "../slideLayouts/slideLayout1.xml"),
                ("rId2", _REL_T + "theme", "../theme/theme1.xml"),
            ]),
        )
        z.writestr("ppt/slideLayouts/slideLayout1.xml", _SLIDE_LAYOUT)
        z.writestr(
            "ppt/slideLayouts/_rels/slideLayout1.xml.rels",
            _rels([("rId1", _REL_T + "slideMaster", "../slideMasters/slideMaster1.xml")]),
        )
        _write_slides(z, slides, "../slideLayouts/slideLayout1.xml")
    return path


def _write_pptx_deck_from_template(path: str, slides: list[dict], template_path: str) -> str:
    """Clone a template's master/layout/theme and append generated slides.

    Copied verbatim from the template: every part EXCEPT its slides, notes,
    presentation.xml(+rels), docProps and [Content_Types].xml — i.e. the
    slideMasters, slideLayouts, themes, and the media/fonts they reference
    survive byte-identical. The generated slides attach to the first layout
    of the first master (the reference template's layout for condition
    slides)."""
    import posixpath
    from xml.etree import ElementTree as ET

    p_ns = "{http://schemas.openxmlformats.org/presentationml/2006/main}"
    r_ns = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
    ct_ns = "{http://schemas.openxmlformats.org/package/2006/content-types}"
    rel_ns = "{http://schemas.openxmlformats.org/package/2006/relationships}"

    def _rel_map(xml: bytes) -> dict[str, str]:
        return {
            rel.get("Id"): rel.get("Target")
            for rel in ET.fromstring(xml).findall(f"{rel_ns}Relationship")
        }

    with zipfile.ZipFile(template_path) as tz:
        tnames = set(tz.namelist())
        pres_root = ET.fromstring(tz.read("ppt/presentation.xml"))
        pres_rel_map = _rel_map(tz.read("ppt/_rels/presentation.xml.rels"))

        master_id_lst = pres_root.find(f"{p_ns}sldMasterIdLst")
        if master_id_lst is None or len(master_id_lst) == 0:
            raise ValueError("template has no slide master")
        master_target = pres_rel_map[master_id_lst[0].get(f"{r_ns}id")]
        master_part = posixpath.normpath(posixpath.join("ppt", master_target))

        master_root = ET.fromstring(tz.read(master_part))
        master_dir = posixpath.dirname(master_part)
        master_rels = _rel_map(
            tz.read(f"{master_dir}/_rels/{posixpath.basename(master_part)}.rels")
        )
        layout_id_lst = master_root.find(f"{p_ns}sldLayoutIdLst")
        if layout_id_lst is None or len(layout_id_lst) == 0:
            raise ValueError("template master has no layouts")
        layout_target = master_rels[layout_id_lst[0].get(f"{r_ns}id")]
        layout_part = posixpath.normpath(posixpath.join(master_dir, layout_target))
        layout_from_slides = posixpath.relpath(layout_part, "ppt/slides")

        sldsz = pres_root.find(f"{p_ns}sldSz")
        cx = sldsz.get("cx") if sldsz is not None else "9144000"
        cy = sldsz.get("cy") if sldsz is not None else "6858000"

        skip_prefixes = ("ppt/slides/", "ppt/notesSlides/", "docProps/")
        skip_exact = {
            "[Content_Types].xml",
            "_rels/.rels",
            "ppt/presentation.xml",
            "ppt/_rels/presentation.xml.rels",
        }
        copied = [
            n
            for n in sorted(tnames)
            if n not in skip_exact and not n.startswith(skip_prefixes)
        ]

        tct = ET.fromstring(tz.read("[Content_Types].xml"))
        defaults = {
            d.get("Extension").lower(): d.get("ContentType")
            for d in tct.findall(f"{ct_ns}Default")
        }
        defaults.setdefault("rels", "application/vnd.openxmlformats-package.relationships+xml")
        defaults.setdefault("xml", "application/xml")
        defaults.setdefault("png", "image/png")
        copied_set = set(copied)
        overrides = {
            o.get("PartName"): o.get("ContentType")
            for o in tct.findall(f"{ct_ns}Override")
            if o.get("PartName", "/").lstrip("/") in copied_set
        }
        overrides["/ppt/presentation.xml"] = (
            "application/vnd.openxmlformats-officedocument.presentationml.presentation.main+xml"
        )
        for i in range(len(slides)):
            overrides[f"/ppt/slides/slide{i + 1}.xml"] = (
                "application/vnd.openxmlformats-officedocument.presentationml.slide+xml"
            )
        ct_xml = (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
            + "".join(
                f'<Default Extension="{ext}" ContentType="{typ}"/>'
                for ext, typ in sorted(defaults.items())
            )
            + "".join(
                f'<Override PartName="{part}" ContentType="{typ}"/>'
                for part, typ in sorted(overrides.items())
            )
            + "</Types>"
        )

        pres_rels = [("rId1", _REL_T + "slideMaster", master_target)]
        sld_ids = []
        for i in range(len(slides)):
            rid = f"rId{i + 2}"
            pres_rels.append((rid, _REL_T + "slide", f"slides/slide{i + 1}.xml"))
            sld_ids.append(f'<p:sldId id="{256 + i}" r:id="{rid}"/>')
        presentation = (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            f"<p:presentation {_P} {_A} {_R}>"
            '<p:sldMasterIdLst><p:sldMasterId id="2147483648" r:id="rId1"/></p:sldMasterIdLst>'
            f'<p:sldIdLst>{"".join(sld_ids)}</p:sldIdLst>'
            f'<p:sldSz cx="{cx}" cy="{cy}"/><p:notesSz cx="6858000" cy="9144000"/>'
            "</p:presentation>"
        )

        with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
            z.writestr("[Content_Types].xml", ct_xml)
            z.writestr("_rels/.rels", _ROOT_RELS)
            z.writestr("ppt/presentation.xml", presentation)
            z.writestr("ppt/_rels/presentation.xml.rels", _rels(pres_rels))
            for n in copied:
                z.writestr(n, tz.read(n))
            # 'timeline' media prefix: never collides with template media
            # (imageN.png is the conventional naming inside templates).
            _write_slides(z, slides, layout_from_slides, media_prefix="timeline")
    return path
