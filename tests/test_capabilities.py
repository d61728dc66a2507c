"""WMTS GetCapabilities document golden — fragments pinned VERBATIM against
the reference's own expected capabilities (reference
tests/test_controller.py CAPABILITIES golden, swissgrid_5/swissgrid_01
fixtures of tests/tilegeneration/test.yaml)."""

from dataclasses import replace

from tilecloud_chain_spark.config import GRIDS, LAYERS
from tilecloud_chain_spark.plans.wmts import get_capabilities_xml

BASE = "http://wmts1/tiles/"


def _render(**kw):
    layers = {
        "all": LAYERS["all"],
        "point": replace(
            LAYERS["point"],
            dimensions={"DATE": ("2005", "2010", "2012")},
            dimension_defaults={"DATE": "2012"},
        ),
        "polygon2": replace(LAYERS["polygon"], name="polygon2", grid="swissgrid_01"),
    }
    return get_capabilities_xml(GRIDS, layers, BASE, **kw)


SWISSGRID_5_MATRIX_0 = """\
      <TileMatrix>
        <ows:Identifier>0</ows:Identifier>
        <ScaleDenominator>357142.85714285716</ScaleDenominator>
        <TopLeftCorner>420000 350000</TopLeftCorner>
        <TileWidth>256</TileWidth>
        <TileHeight>256</TileHeight>
        <MatrixWidth>19</MatrixWidth>
        <MatrixHeight>13</MatrixHeight>
      </TileMatrix>"""

SWISSGRID_5_MATRIX_4 = """\
      <TileMatrix>
        <ows:Identifier>4</ows:Identifier>
        <ScaleDenominator>17857.14285714286</ScaleDenominator>
        <TopLeftCorner>420000 350000</TopLeftCorner>
        <TileWidth>256</TileWidth>
        <TileHeight>256</TileHeight>
        <MatrixWidth>375</MatrixWidth>
        <MatrixHeight>250</MatrixHeight>
      </TileMatrix>"""

# swissgrid_01 (resolutions 1/0.2/0.1, resolution-named matrices) — the
# reference golden pins identifiers '1', '0_2', '0_1' and the matrix sizes
SWISSGRID_01_FRAGMENT = """\
      <TileMatrix>
        <ows:Identifier>0_1</ows:Identifier>
        <ScaleDenominator>357.14285714285717</ScaleDenominator>
        <TopLeftCorner>420000 350000</TopLeftCorner>
        <TileWidth>256</TileWidth>
        <TileHeight>256</TileHeight>
        <MatrixWidth>18750</MatrixWidth>
        <MatrixHeight>12500</MatrixHeight>
      </TileMatrix>"""

# 'all' layer (bbox 550000,170000,560000,180000) — the reference golden's
# TileMatrixSetLimits rows
ALL_LIMITS_FRAGMENT = """\
        <TileMatrixSetLimits>
          <TileMatrixLimits>
            <TileMatrix>0</TileMatrix>
            <MinTileRow>6</MinTileRow>
            <MaxTileRow>7</MaxTileRow>
            <MinTileCol>5</MinTileCol>
            <MaxTileCol>5</MaxTileCol>
          </TileMatrixLimits>
          <TileMatrixLimits>
            <TileMatrix>1</TileMatrix>
            <MinTileRow>13</MinTileRow>
            <MaxTileRow>14</MaxTileRow>
            <MinTileCol>10</MinTileCol>
            <MaxTileCol>10</MaxTileCol>
          </TileMatrixLimits>
          <TileMatrixLimits>
            <TileMatrix>2</TileMatrix>
            <MinTileRow>33</MinTileRow>
            <MaxTileRow>35</MaxTileRow>
            <MinTileCol>25</MinTileCol>
            <MaxTileCol>27</MaxTileCol>
          </TileMatrixLimits>
          <TileMatrixLimits>
            <TileMatrix>3</TileMatrix>
            <MinTileRow>66</MinTileRow>
            <MaxTileRow>70</MaxTileRow>
            <MinTileCol>50</MinTileCol>
            <MaxTileCol>54</MaxTileCol>
          </TileMatrixLimits>
          <TileMatrixLimits>
            <TileMatrix>4</TileMatrix>
            <MinTileRow>132</MinTileRow>
            <MaxTileRow>140</MaxTileRow>
            <MinTileCol>101</MinTileCol>
            <MaxTileCol>109</MaxTileCol>
          </TileMatrixLimits>
        </TileMatrixSetLimits>"""

POINT_LAYER_FRAGMENT = """\
    <Layer>
      <ows:Title>point</ows:Title>
      <ows:Identifier>point</ows:Identifier>
      <Style isDefault="true">
        <ows:Identifier>default</ows:Identifier>
      </Style>
      <Format>image/png</Format>
      <Dimension>
        <ows:Identifier>DATE</ows:Identifier>
        <Default>2012</Default>
        <Value>2005</Value>
        <Value>2010</Value>
        <Value>2012</Value>
      </Dimension>
      <ResourceURL format="image/png" resourceType="tile"
                   template="http://wmts1/tiles/1.0.0/point/default/{DATE}/{TileMatrixSet}/{TileMatrix}/{TileRow}/{TileCol}.png" />
      <TileMatrixSetLink>
        <TileMatrixSet>swissgrid_5</TileMatrixSet>
      </TileMatrixSetLink>
    </Layer>"""


def test_matrix_fragments():
    xml = _render()
    assert SWISSGRID_5_MATRIX_0 in xml
    assert SWISSGRID_5_MATRIX_4 in xml
    assert SWISSGRID_01_FRAGMENT in xml
    assert "<ows:SupportedCRS>urn:ogc:def:crs:EPSG::21781</ows:SupportedCRS>" in xml


def test_all_layer_limits_golden():
    assert ALL_LIMITS_FRAGMENT in _render()


def test_layer_block_with_dimension():
    assert POINT_LAYER_FRAGMENT in _render()


def test_operations_metadata_and_wellformed():
    import xml.etree.ElementTree as ET

    xml = _render()
    assert (
        '<ows:Get xlink:href="http://wmts1/tiles/1.0.0/WMTSCapabilities.xml">' in xml
    )
    root = ET.fromstring(xml)  # well-formed XML
    ns = "{http://www.opengis.net/wmts/1.0}"
    assert root.tag == f"{ns}Capabilities"
    sets = root.findall(f".//{ns}TileMatrixSet/")
    assert sets  # Contents populated


def test_multi_grid_layer_gets_multiple_links():
    """A layer on several grids emits one TileMatrixSetLink per grid
    (reference get_grid_names / test_multi_grid capabilities)."""
    layers = {
        "both": replace(LAYERS["point"], grids=("swissgrid_5", "swissgrid_01")),
    }
    xml = get_capabilities_xml(GRIDS, layers, BASE)
    assert xml.count("<TileMatrixSetLink>") == 2
    assert "<TileMatrixSet>swissgrid_5</TileMatrixSet>" in xml
    assert "<TileMatrixSet>swissgrid_01</TileMatrixSet>" in xml
