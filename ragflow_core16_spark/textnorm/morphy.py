"""WordNet-morphy noun lemmatization (exact algorithm, pluggable lexicon).

Reference analogue: ``rag/nlp/rag_tokenizer.py:67,266`` calls NLTK's
``WordNetLemmatizer().lemmatize(t)`` with the DEFAULT pos — i.e. noun
morphy only.  That algorithm (public, from WordNet's morphy and NLTK's
``wordnet._morphy``) is implemented here exactly:

  0. if the form is a known irregular (noun.exc), candidates are the
     form itself plus its exception lemmas;
  1. otherwise candidates are the form plus one application of the noun
     detachment rules (s→ '', ses→s, ves→f, xes→x, zes→z, ches→ch,
     shes→sh, men→man, ies→y);
  2. rules re-apply repeatedly to the previous round's outputs until
     some candidate validates;
  * at every step candidates are VALIDATED against the noun lexicon —
    an unknown word comes back unchanged (morphy never guesses);
  * ``lemmatize`` returns the SHORTEST validated candidate
    (``min(lemmas, key=len)``), or the word itself when none validate.

The algorithm is exact; the WordNet lexicon itself is an external asset
(same situation as ``huqie.txt`` for the CJK dict): a built-in ~1.1k
common-noun lexicon plus the full irregular-plural table ships by
default, and ``RAG_WORDNET_NOUNS`` loads a full ``index.noun``-derived
wordlist (one lemma per line) for deployment parity.
"""

from __future__ import annotations

import os
from functools import lru_cache

# WordNet noun detachment rules (MORPHOLOGICAL_SUBSTITUTIONS[NOUN])
_NOUN_RULES = [
    ("s", ""), ("ses", "s"), ("ves", "f"), ("xes", "x"), ("zes", "z"),
    ("ches", "ch"), ("shes", "sh"), ("men", "man"), ("ies", "y"),
]

# irregular plurals (noun.exc-style; public list)
_NOUN_EXC = {
    "aquaria": ["aquarium"], "alumni": ["alumnus"], "alumnae": ["alumna"],
    "analyses": ["analysis"], "antennae": ["antenna"],
    "appendices": ["appendix"], "axes": ["ax", "axis"],
    "bacilli": ["bacillus"], "bacteria": ["bacterium"], "bases": ["basis"],
    "beaux": ["beau"], "bison": ["bison"], "brethren": ["brother"],
    "bureaux": ["bureau"], "cacti": ["cactus"], "calves": ["calf"],
    "children": ["child"], "corpora": ["corpus"], "crises": ["crisis"],
    "criteria": ["criterion"], "curricula": ["curriculum"],
    "data": ["datum"], "deer": ["deer"], "diagnoses": ["diagnosis"],
    "dice": ["die"], "dwarves": ["dwarf"], "elves": ["elf"],
    "emphases": ["emphasis"], "errata": ["erratum"], "feet": ["foot"],
    "fish": ["fish"], "foci": ["focus"], "formulae": ["formula"],
    "fungi": ["fungus"], "geese": ["goose"], "genera": ["genus"],
    "halves": ["half"], "hooves": ["hoof"], "hypotheses": ["hypothesis"],
    "indices": ["index"], "knives": ["knife"], "larvae": ["larva"],
    "leaves": ["leaf"], "lice": ["louse"], "lives": ["life"],
    "loaves": ["loaf"], "matrices": ["matrix"], "media": ["medium"],
    "memoranda": ["memorandum"], "men": ["man"], "mice": ["mouse"],
    "moose": ["moose"], "neuroses": ["neurosis"], "nuclei": ["nucleus"],
    "oases": ["oasis"], "octopi": ["octopus"], "oxen": ["ox"],
    "parentheses": ["parenthesis"], "people": ["person"],
    "phenomena": ["phenomenon"], "quizzes": ["quiz"], "radii": ["radius"],
    "scarves": ["scarf"], "selves": ["self"], "series": ["series"],
    "sheep": ["sheep"], "shelves": ["shelf"], "species": ["species"],
    "stimuli": ["stimulus"], "strata": ["stratum"], "swine": ["swine"],
    "syllabi": ["syllabus"], "symposia": ["symposium"],
    "syntheses": ["synthesis"], "teeth": ["tooth"], "theses": ["thesis"],
    "thieves": ["thief"], "vertebrae": ["vertebra"], "vertices": ["vertex"],
    "vortices": ["vortex"], "wives": ["wife"], "wolves": ["wolf"],
    "women": ["woman"],
}

# built-in noun lexicon: ~1.1k common English nouns (web/tech register
# weighted — this engine processes web text) + every exception lemma.
# RAG_WORDNET_NOUNS replaces it with a full index.noun wordlist.
_BUILTIN_NOUNS = """
ability access accident account act action activity actor address
administration adult advance advantage advertising advice affair age
agency agent agreement air aircraft airline airport alarm album alcohol
algorithm amount analysis analyst anchor angle animal answer apartment
api app apple application appointment approach architecture area
argument arm army array arrival art article artist aspect assignment
assistant association assumption atmosphere attack attempt attention
attitude audience author authority average award baby back background
bag balance ball band bank bar base baseline basis basket batch bath
battery battle beach bear beauty bed bedroom beer beginning behavior
belief bell belt benchmark benefit bias bicycle bill bin bird birth
birthday bit block blog blood board boat body bone bonus book boot
border boss bottle bottom boundary bowl box boy brain branch brand
bread break breakfast breath brick bridge broadcast brother browser
bucket budget buffer bug building bus business button buyer byte cable
cache cake calendar call camera camp campaign campus cancer candidate
cap capacity capital captain car card care career cargo carpet carrier
case cash cat catalog category cause ceiling cell census center century
chain chair challenge chance change channel chapter character charge
chart check cheese chef chemical chest chicken chief child choice
church cigarette circle citizen city claim class classroom client
climate clock cloth cloud cluster coach coast code codec coffee column
combination comment commission committee community company comparison
competition compiler complaint component computer concept concern
concert conclusion condition conference config confidence conflict
connection consequence constant constraint construction consumer
contact container content contest context contract contribution
control conversation cookie copy core corner corpus cost council count
counter country county couple courage course court cousin cover cow
crash credit crew crime criticism crop cross crowd cultivar culture
cup currency current curve customer cycle dad damage dance danger
data database date daughter day deal dealer death debate debt decade
decision deck decoder default defense definition degree delay delivery
demand density department departure deposit depth design designer
desire desk detail detection developer development device diagram
dialect dialog diet difference difficulty dimension dinner direction
director dirt disaster discipline discount discussion disease dish
disk display distance distribution district doctor document dog dollar
domain door dot downtown dozen draft drama drawer drawing dream dress
drink driver drop drug dump dust duty ear earth east economy edge
editor education effect efficiency effort egg election element
elevator email emergency emotion emphasis employee employer employment
encoder end enemy energy engine engineer entry environment episode
equipment error escape essay estate estimate evening event evidence
exam example exchange executor exercise exit experience expert
explanation expression extent eye face fact factor factory failure
fall family fan farm farmer fashion father fault feature fee feedback
feeling female fence field fig fight figure file filter final finding
finger fire firm fish flag flight floor flow flower focus folder food
foot force forest fork form format fortune forum foundation frame
framework freedom friend front fruit fuel fun function fund future
gain galaxy game gap garage garden gas gate gather gear gene
generation gentleman gift girl glass goal gold golf government grade
grain gram grandmother graph grass group growth guard guess guest
guidance guide guitar gun guy habit hair half hall hand handle harbor
hash hat head health hearing heart heat height hello help hero
highway hill history hit hobby hole holiday home honey hook hope horse
hospital host hotel hour house household housing human hundred husband
ice idea image impact implementation importance impression improvement
inch incident income increase independence index indication industry
inflation influence information ingredient initiative injury input
inspection inspector instance instruction insurance intention interest
internet interview introduction investment invoice iron island issue
item job join joint journal journey judge judgment juice jump jury
kernel key keyboard kid kilometer kind king kitchen knee knife
knowledge lab label lack ladder lady lake lamp land language laptop
latency law lawyer layer layout lead leader leadership leaf league
lecture leg length lesson letter level library license lie life light
limit line link lip liquid list listing literature load loaf loan
lock log logic loop loss lot love luck lunch machine magazine mail
main maintenance majority male mall man management manager manner
manual map margin mark market marketing marriage master match material
math matrix matter meal meaning measure measurement meat medicine
medium meeting member membership memory mention menu merge message
metadata metal meter method midnight migration mile milk mind minute
mirror mission mistake mix mixture mode model mom moment money monitor
month mood morning mother motor mountain mouse mouth move movie mud
muscle music nation nature neck need network news newspaper night
node noise north nose note notebook notice novel number nurse object
objective obligation occasion offer office officer oil operation
operator opinion opportunity option orange order organization origin
outcome output oven owner package page pain paint painting pair panel
paper paragraph parent park parser part partition partner party pass
passage passenger password past patch path patience patient pattern
pause payload payment peace peak penalty people percentage perception
performance period permission person personality perspective phase
philosophy phone photo phrase physics piano picture pie piece pin pipe
pipeline pitch pixel pizza place plan plane planet plant plastic plate
platform play player pleasure plenty poem poet poetry point police
policy politics pollution pool population port position possession
possibility post pot potato pound power practice prefix preparation
presence present president pressure price pride priest primary
principle print printer priority prison problem procedure process
processor produce product profession professor profile profit program
project promise promotion prompt proof property proposal protection
protocol psychology public purchase purpose push quality quantity
quarter queen query question queue quiz radio rain range rank rate
ratio reaction reader reading reality reason recipe record recording
recovery reference reflection region register regret relation
relationship release relief religion replacement reply report request
requirement research resident resolution resource respect response
responsibility rest restaurant result return revenue review
revolution reward rice ring risk river road rock role roof room root
rope rotation route routine row rule runtime safety salad salary sale
salt sample sand scale scan scene schedule schema scheme school
science scientist score scratch screen script sea search season seat
second secret secretary section sector security seed segment
selection self seller sense sentence series server service session
set setting shape share shell shift ship shirt shoe shop shopping
shoulder show shower side sign signal signature silver singer sink
sister site situation size skill skin sky sleep slice slide smoke
snapshot snow society sock software soil solution son song sort sound
soup source south space speaker species speech speed spark spirit
sport spot spouse spring square stack staff stage standard star start
state statement station status steak steel step stick stock stomach
stop storage store storm story strategy stream street strength stress
string structure struggle student studio study stuff style subject
substance success suffix sugar suggestion suite summer sun supplier
supply support surface surgery surprise survey suspect switch symbol
sympathy syntax system table tail tale talk tank target task taste
tax tea teacher team tear technology telephone television temperature
template tennis tension term test text thanks theme theory thing
thread throat thumb ticket tie time tip title token tongue tool tooth
top topic total touch tour tourist towel tower town toy track trade
tradition traffic train trainer training transaction transition
transport trash travel treatment tree trick trip truck trust truth
tune tuple turn twist type uncle union unit update upgrade usage user
vacation value variable variation variety vector vehicle version
video view village virus visit visitor voice volume wall war warning
watch water wave way wealth weather web website wedding week weekend
weight west wheel while wife win wind window wine wing winner winter
wire wish woman wood word work worker workshop world worry wrap
writer writing yard year youth zone
""".split() + """
acre actress airplane alley almond ambulance anchor ankle ant antenna
apartment apology appetite apricot apron aquarium arch archer arena
arrow ash asset astronomer athlete atom attic auction audit aunt
avenue axe axis bacon badge bag bakery balcony balloon bamboo banana
banner barn barrel basement bat bay beam bean beard beast bee beef
beet beetle bell berry bicycle billboard biography biology birch
biscuit blade blanket blizzard blossom blouse blueberry boar bolt
bomb bone bonnet border bowl bracelet brake brass bravery breeze
bride bridge broccoli bronze broom bubble bud buffalo bulb bull
bullet bumper bun bundle bunker burden bureau burglar bush butter
butterfly buttonhole cabbage cabin cabinet cactus cafe cage
calculator calf camel canal candle candy cannon canoe canvas canyon
captive caramel caravan carbon cardboard cardinal carnival carpenter
carriage carrot cart cartoon cascade cashier casserole castle cat
caterpillar cathedral cattle cauliflower cave celery cellar cello
cement cemetery chain chalk chamber chandelier chapel chariot charm
chart cheek cheetah cherry chess chestnut chimney chin china chip
chocolate choir chord chorus cider cinema cinnamon circus clam
clarinet clay cliff clinic cloak closet clover clown club clue coal
coat cobweb cockpit cocoa coconut cod coffin coin collar colony
comb comedy comet compass concrete cone constellation continent
copper coral cord corduroy cork corn corpse corridor cottage cotton
couch cougar courtyard crab cradle crane crater crayon cream creek
cricket crocodile crow crown crumb crust crystal cub cube cucumber
cupboard curb curtain cushion cypress dagger dairy daisy dam dancer
dandelion dart dashboard dawn deck deed delta demon den denim dessert
dew diamond diary dice dictionary dime dinosaur diploma dipper ditch
dock doctrine dolphin dome donkey donor dough dove dragon dragonfly
drain drawbridge drill drought drum duck duckling duke dune dusk
eagle earthquake easel eclipse eel elbow elder elephant elm embassy
ember emerald emperor empire engine envelope equator ermine escort
essence estuary ether eyebrow eyelash fabric falcon fang fawn feast
feather fern ferry fever fiber fiddle fig filament fin firefly
fireplace firework fist flame flamingo flannel flask fleet flesh
flint flock flood flour flu flute foam fog foil folk forehead
forge fort fountain fox fraction freckle freezer freight frog frost
frown fudge fume funnel fur furnace galleon gallery gallon galoshes
gander garland garlic garment gazelle gem general geranium giant
ginger giraffe glacier glade gland glider globe glove glue goat
goggles goldfish gondola gong gorilla gown granite grape grapefruit
grasshopper gravel gravy grease greenhouse grenade greyhound grill
grove guardian gull gum gutter gymnasium hail hamburger hammer
hammock hamper hamster handkerchief handlebar hare harmonica harness
harp harvest hatch hawk hay hazel heater hedge hedgehog heel heir
helicopter helmet hen herb herd hermit heron hickory hinge hive hog
honeycomb hood hoof horizon horn hornet hose hound hurricane hut
hyena iceberg icicle idol igloo incense infant ink inlet inn insect
iris ivory ivy jacket jade jaguar jam jar jaw jelly jellyfish jewel
jug jungle kangaroo kayak keel keg kettle kettledrum kingdom kite
kitten knapsack knight knob knot koala lace ladle ladybug lagoon
lair lamb lantern lapel larch lard lark lava lavender lawn lead
leash ledge leek lemon lemonade lens leopard leotard lettuce lever
lighthouse lilac lily lime limestone limousine linen lint lion
liver lizard llama lobster locket locomotive locust lodge loft
lumber lynx mackerel magnet magnolia mahogany maid mane mango
mansion mantel maple marble mare marigold marsh mask mast mat
mattress meadow melon mermaid meteor midst mildew mill millet
miner mink mint missile mist mitten moat mole monastery monk
monkey monster monument moon moonlight morsel mosaic mosquito
moss moth motorcycle mound mule mushroom musket mustache mustard
myth nail napkin nectar needle nest nettle nickel nightingale
noodle nostril nugget nursery nut nutmeg nylon oak oar oasis oat
oatmeal ocean octopus offspring ointment olive omelet onion opal
opera orchard orchestra orchid ore organ oriole ostrich otter
outline outpost owl oxcart oyster paddle padlock pail palace palm
pancake panda pansy panther pantry parachute parade parakeet parcel
parlor parrot parsley parsnip pasture patio paw peach peacock
peanut pear pearl peasant pebble pecan pedal pelican pendulum
penguin peninsula penny pepper perch perfume petal petticoat pew
pheasant pickle pier pigeon pike pillar pillow pilot pine pineapple
pistol pit pitcher plank plateau platter plow plum plumber plume
pocket pod pony poppy porch porcupine porridge porter postcard
poster pouch poultry prairie prune pudding puddle pulley pump
pumpkin puppet puppy pyramid quail quarry quart quartz quill quilt
rabbit raccoon raft rag raisin rake ranch raspberry rat raven
ravine razor reef reindeer reptile rhubarb rib ribbon riddle ridge
rifle rim rind rink ripple robe robin rocket rod rooster rosebud
rudder rug ruler rust rye saddle sage sail sailor salmon saloon
sandal sandwich sap sapphire sardine satchel satin sauce saucer
sausage saw scaffold scallop scalp scar scarecrow scarf schooner
scooter scorpion scroll scythe seal seam seaweed sedan seesaw
serpent shack shale shamrock shark shawl shed shepherd sheriff
shield shin shingle shovel shrimp shrub shutter sickle silk sill
siren skate skeleton ski skillet skirt skull skunk sled sleeve
sleigh slipper slope sloth smock snail snake snout snowflake sofa
sole sparrow spear sphere spider spinach spine spiral spire sponge
spool spoon spout sprout spruce spur squadron squid squirrel
stable stadium stagecoach stair stake stallion stamp starch
starfish statue steam steamboat steeple stem stew stilt sting
stork stove strait strap straw strawberry stream stump sturgeon
submarine suburb sulfur sundial sunflower surf swallow swamp swan
sweater swing sword sycamore syrup tablet tadpole taffy talon
tambourine tangerine tapestry tar tarp tassel tavern teapot
telescope tent tentacle termite terrace thermometer thicket thigh
thimble thistle thorn thread throne thunder tiara tide tiger tile
timber tin toad toadstool toast toe tomato tomb tonic torch
tornado torpedo tortoise tote tourniquet trail trailer tram
trampoline trapeze tray treasure trench triangle tribe tributary
trolley trombone trout trowel trumpet trunk tub tuba tulip tundra
tunnel turban turkey turnip turret turtle tusk tutor tweed twig
twine udder umbrella umpire unicorn urn vacuum vale valley valve
van vane vanilla vapor vase vault veal veil vein velvet vendor
vine vinegar viola violet violin vise vowel voyage vulture waffle
wagon waist walnut walrus wand wardrobe warehouse wart wasp weasel
weed well whale wharf wheat whisker whistle wick wig wigwam willow
wilt wince windmill windshield wink wolf wombat wool workbench
worm wreath wren wrench wrist yacht yak yarn yeast yoke yolk zebra
zephyr zinc zipper
""".split()


def _load_lexicon() -> frozenset:
    path = os.environ.get("RAG_WORDNET_NOUNS")
    if path and os.path.exists(path):
        with open(path, encoding="utf-8") as f:
            words = [ln.strip().lower() for ln in f if ln.strip()]
        base = set(words)
    else:
        base = set(_BUILTIN_NOUNS)
    for lemmas in _NOUN_EXC.values():
        base.update(lemmas)
    return frozenset(base)


_LEXICON = _load_lexicon()


def _apply_rules(forms: list[str]) -> list[str]:
    return [f[: -len(old)] + new
            for f in forms for old, new in _NOUN_RULES if f.endswith(old)]


def _filter(forms: list[str]) -> list[str]:
    seen, out = set(), []
    for f in forms:
        if f in _LEXICON and f not in seen:
            out.append(f)
            seen.add(f)
    return out


def morphy(form: str) -> list[str]:
    """All validated noun lemma candidates (nltk ``wordnet._morphy``)."""
    if form in _NOUN_EXC:
        results = _filter([form] + _NOUN_EXC[form])
        if results:
            return results
    forms = _apply_rules([form])
    results = _filter([form] + forms)
    if results:
        return results
    while forms:
        forms = _apply_rules(forms)
        results = _filter(forms)
        if results:
            return results
    return []


@lru_cache(maxsize=1 << 16)
def lemmatize(word: str) -> str:
    """``WordNetLemmatizer().lemmatize(word)`` with the default noun pos:
    shortest validated candidate, or the word unchanged."""
    lemmas = morphy(word)
    return min(lemmas, key=len) if lemmas else word
