"""Fixed SDL text blocks of the generated GraphQL API surface.

These are the reference's schemaExtras — the scalar/input/enum/directive
definitions every generated schema embeds verbatim (graphql/schema/
gqlschema.go:104-330 schemaInputs/directiveDefs/filterInputs). They are
API surface TEXT (SDL), not engine code: byte-for-byte parity of the
generated schema requires embedding them byte-for-byte.
"""

schemaInputs = '\n"""\nThe Int64 scalar type represents a signed 64‐bit numeric non‐fractional value.\nInt64 can represent values in range [-(2^63),(2^63 - 1)].\n"""\nscalar Int64\n\n"""\nThe DateTime scalar type represents date and time as a string in RFC3339 format.\nFor example: "1985-04-12T23:20:50.52Z" represents 20 mins 50.52 secs after the 23rd hour of Apr 12th 1985 in UTC.\n"""\nscalar DateTime\n\ninput IntRange{\n\tmin: Int!\n\tmax: Int!\n}\n\ninput FloatRange{\n\tmin: Float!\n\tmax: Float!\n}\n\ninput Int64Range{\n\tmin: Int64!\n\tmax: Int64!\n}\n\ninput DateTimeRange{\n\tmin: DateTime!\n\tmax: DateTime!\n}\n\ninput StringRange{\n\tmin: String!\n\tmax: String!\n}\n\nenum DgraphIndex {\n\tint\n\tint64\n\tfloat\n\tbool\n\thash\n\texact\n\tterm\n\tfulltext\n\ttrigram\n\tregexp\n\tyear\n\tmonth\n\tday\n\thour\n\tgeo\n\thnsw\n}\n\ninput AuthRule {\n\tand: [AuthRule]\n\tor: [AuthRule]\n\tnot: AuthRule\n\trule: String\n}\n\nenum HTTPMethod {\n\tGET\n\tPOST\n\tPUT\n\tPATCH\n\tDELETE\n}\n\nenum Mode {\n\tBATCH\n\tSINGLE\n}\n\ninput CustomHTTP {\n\turl: String!\n\tmethod: HTTPMethod!\n\tbody: String\n\tgraphql: String\n\tmode: Mode\n\tforwardHeaders: [String!]\n\tsecretHeaders: [String!]\n\tintrospectionHeaders: [String!]\n\tskipIntrospection: Boolean\n}\n\ninput DgraphDefault {\n\tvalue: String\n}\n\ntype Point {\n\tlongitude: Float!\n\tlatitude: Float!\n}\n\ninput PointRef {\n\tlongitude: Float!\n\tlatitude: Float!\n}\n\ninput NearFilter {\n\tdistance: Float!\n\tcoordinate: PointRef!\n}\n\ninput PointGeoFilter {\n\tnear: NearFilter\n\twithin: WithinFilter\n}\n\ntype PointList {\n\tpoints: [Point!]!\n}\n\ninput PointListRef {\n\tpoints: [PointRef!]!\n}\n\ntype Polygon {\n\tcoordinates: [PointList!]!\n}\n\ninput PolygonRef {\n\tcoordinates: [PointListRef!]!\n}\n\ntype MultiPolygon {\n\tpolygons: [Polygon!]!\n}\n\ninput MultiPolygonRef {\n\tpolygons: [PolygonRef!]!\n}\n\ninput WithinFilter {\n\tpolygon: PolygonRef!\n}\n\ninput ContainsFilter {\n\tpoint: PointRef\n\tpolygon: PolygonRef\n}\n\ninput IntersectsFilter {\n\tpolygon: PolygonRef\n\tmultiPolygon: MultiPolygonRef\n}\n\ninput PolygonGeoFilter {\n\tnear: NearFilter\n\twithin: WithinFilter\n\tcontains: ContainsFilter\n\tintersects: IntersectsFilter\n}\n\ninput GenerateQueryParams {\n\tget: Boolean\n\tquery: Boolean\n\tpassword: Boolean\n\taggregate: Boolean\n}\n\ninput GenerateMutationParams {\n\tadd: Boolean\n\tupdate: Boolean\n\tdelete: Boolean\n}\n'

directiveDefs = """
directive @hasInverse(field: String!) on FIELD_DEFINITION
directive @search(by: [String!]) on FIELD_DEFINITION
directive @embedding on FIELD_DEFINITION
directive @dgraph(type: String, pred: String) on OBJECT | INTERFACE | FIELD_DEFINITION
directive @id(interface: Boolean) on FIELD_DEFINITION
directive @default(add: DgraphDefault, update: DgraphDefault) on FIELD_DEFINITION
directive @withSubscription on OBJECT | INTERFACE | FIELD_DEFINITION
directive @secret(field: String!, pred: String) on OBJECT | INTERFACE
directive @auth(
	password: AuthRule
	query: AuthRule,
	add: AuthRule,
	update: AuthRule,
	delete: AuthRule) on OBJECT | INTERFACE
directive @custom(http: CustomHTTP, dql: String) on FIELD_DEFINITION
directive @remote on OBJECT | INTERFACE | UNION | INPUT_OBJECT | ENUM
directive @remoteResponse(name: String) on FIELD_DEFINITION
directive @cascade(fields: [String]) on FIELD
directive @lambda on FIELD_DEFINITION
directive @lambdaOnMutate(add: Boolean, update: Boolean, delete: Boolean) on OBJECT | INTERFACE
directive @cacheControl(maxAge: Int!) on QUERY
directive @generate(
	query: GenerateQueryParams,
	mutation: GenerateMutationParams,
	subscription: Boolean) on OBJECT | INTERFACE
"""

apolloSupportedDirectiveDefs = """
directive @hasInverse(field: String!) on FIELD_DEFINITION
directive @search(by: [String!]) on FIELD_DEFINITION
directive @embedding on FIELD_DEFINITION
directive @dgraph(type: String, pred: String) on OBJECT | INTERFACE | FIELD_DEFINITION
directive @id(interface: Boolean) on FIELD_DEFINITION
directive @default(add: DgraphDefault, update: DgraphDefault) on FIELD_DEFINITION
directive @withSubscription on OBJECT | INTERFACE | FIELD_DEFINITION
directive @secret(field: String!, pred: String) on OBJECT | INTERFACE
directive @remote on OBJECT | INTERFACE | UNION | INPUT_OBJECT | ENUM
directive @remoteResponse(name: String) on FIELD_DEFINITION
directive @lambda on FIELD_DEFINITION
directive @lambdaOnMutate(add: Boolean, update: Boolean, delete: Boolean) on OBJECT | INTERFACE
"""

filterInputs = """
input IntFilter {
	eq: Int
	in: [Int]
	le: Int
	lt: Int
	ge: Int
	gt: Int
	between: IntRange
}

input Int64Filter {
	eq: Int64
	in: [Int64]
	le: Int64
	lt: Int64
	ge: Int64
	gt: Int64
	between: Int64Range
}

input FloatFilter {
	eq: Float
	in: [Float]
	le: Float
	lt: Float
	ge: Float
	gt: Float
	between: FloatRange
}

input DateTimeFilter {
	eq: DateTime
	in: [DateTime]
	le: DateTime
	lt: DateTime
	ge: DateTime
	gt: DateTime
	between: DateTimeRange
}

input StringTermFilter {
	allofterms: String
	anyofterms: String
}

input StringRegExpFilter {
	regexp: String
}

input StringNgramFilter {
	ngram: String
}

input StringFullTextFilter {
	alloftext: String
	anyoftext: String
}

input StringExactFilter {
	eq: String
	in: [String]
	le: String
	lt: String
	ge: String
	gt: String
	between: StringRange
}

input StringHashFilter {
	eq: String
	in: [String]
}
"""

apolloSchemaExtras = """
scalar _Any
scalar _FieldSet

type _Service {
	sdl: String
}

directive @external on FIELD_DEFINITION
directive @requires(fields: _FieldSet!) on FIELD_DEFINITION
directive @provides(fields: _FieldSet!) on FIELD_DEFINITION
directive @key(fields: _FieldSet!) on OBJECT | INTERFACE
directive @extends on OBJECT | INTERFACE
"""

apolloSchemaQueries = """
type Query {
	_entities(representations: [_Any!]!): [_Entity]!
	_service: _Service!
}
"""

